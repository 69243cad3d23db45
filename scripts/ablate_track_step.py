"""In-situ attribution of the tracking step cost by ablation.

Measures the REAL compiled 10-iteration tracking frame (Replica budget:
200 px x 48 samples, color stage, expanded grids prepared outside the scan)
and re-measures with one piece ablated at a time:

  full          the production make_track_frame program
  fwd_only      loss only inside the scan (no grad/Adam)
  no_sort       z concat without the 48-lane sort (WRONG math — timing only)
  no_color      depth loss only (kills the color-decoder branch)
  pix1000       1000 px instead of 200 (how sublinear is the cost?)
  iters1        a 1-iteration scan (per-frame fixed overhead)

Usage: python scripts/ablate_track_step.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from nice_slam_tpu.utils.compilation_cache import enable
    enable()
    jax.config.update('jax_default_matmul_precision', 'float32')

    from nice_slam_tpu.core.cameras import Intrinsics
    from nice_slam_tpu.engine.tracker import TrackerConfig, make_track_frame
    from nice_slam_tpu.models.decoders import (
        DecoderConfig, init_nice_decoders)
    from nice_slam_tpu.models.grids import (
        GridConfig, init_grids, prepare_grids, round_bound,
        static_grid_shapes)
    from nice_slam_tpu.render import renderer as R
    from nice_slam_tpu.render.renderer import RenderConfig, SceneModel

    bound = round_bound([[-1.3, 7.4], [-3.1, 3.2], [-1.7, 2.3]], 0.32)
    gcfg = GridConfig(bound=bound)
    dcfg = DecoderConfig()
    rcfg = RenderConfig(n_samples=32, n_surface=16)
    intr = Intrinsics(H=680, W=1200, fx=600.0, fy=600.0, cx=599.5, cy=339.5)
    model = SceneModel(kind='nice', decoder=dcfg,
                       bound=jnp.asarray(gcfg.bound_np),
                       coarse_bound=jnp.asarray(gcfg.coarse_bound_np),
                       grid_shapes=static_grid_shapes(gcfg))
    key = jax.random.PRNGKey(0)
    kg, kd, kc, key = jax.random.split(key, 4)
    grids = prepare_grids(init_grids(kg, gcfg), model.grid_shapes,
                          stage='color')
    params = init_nice_decoders(kd, dcfg)

    color = jax.random.uniform(kc, (intr.H, intr.W, 3))
    depth = jnp.full((intr.H, intr.W), 1.5)
    cam7 = jnp.asarray([1.0, 0, 0, 0, 2.0, 0.0, 0.3])

    def run_case(label, fn, k_iters):
        out = fn(params, grids, color, depth, cam7, key)
        jax.block_until_ready(out)
        best = np.inf
        for _ in range(5):
            t0 = time.perf_counter()
            out = fn(params, grids, color, depth, cam7, key)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        ms = best * 1e3
        print(f'{label:14s} {ms:8.2f} ms / {k_iters} iters '
              f'= {ms / k_iters:6.3f} ms/iter')
        return ms

    import contextlib

    @contextlib.contextmanager
    def no_sort_patch():
        orig = R.jnp.sort
        R.jnp.sort = lambda x, axis=-1: x  # WRONG math — timing only
        try:
            yield
        finally:
            R.jnp.sort = orig

    def build(tcfg, fwd_only=False):
        if not fwd_only:
            return make_track_frame(model=model, rcfg=rcfg, tcfg=tcfg,
                                    intr=intr)
        from nice_slam_tpu.engine.tracker import tracking_loss

        def frame(params, grids, gt_color, gt_depth, cam7, key):
            def body(carry, it):
                k = jax.random.fold_in(key, it)
                loss = tracking_loss(carry, params, grids, gt_color,
                                     gt_depth, k, model=model, rcfg=rcfg,
                                     tcfg=tcfg, intr=intr)
                return carry, loss
            _, losses = jax.lax.scan(body, cam7, jnp.arange(tcfg.iters))
            return losses
        return jax.jit(frame)

    base = TrackerConfig(pixels=200, iters=10)
    run_case('full', build(base), 10)
    run_case('fwd_only', build(base, fwd_only=True), 10)
    with no_sort_patch():
        run_case('no_sort', build(base), 10)
    run_case('no_color', build(base._replace(use_color=False)), 10)
    run_case('pix1000', build(base._replace(pixels=1000)), 10)
    run_case('iters1', build(base._replace(iters=1)), 1)


if __name__ == '__main__':
    main()
