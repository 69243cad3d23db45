"""Measure the REAL engine programs (make_track_frame / make_map_step) at
the Replica budget, comparing expanded vs baseline gather layouts.

Usage: python scripts/profile_steps.py
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
    from nice_slam_tpu.engine.mapper import (
        MapperConfig, lr_table, make_map_step, stage_schedule)
    from nice_slam_tpu.engine.tracker import TrackerConfig, make_track_frame
    from nice_slam_tpu.models.decoders import (
        DecoderConfig, init_nice_decoders)
    from nice_slam_tpu.models.grids import (
        GridConfig, init_grids, round_bound, static_grid_shapes)
    from nice_slam_tpu.render.renderer import RenderConfig, SceneModel

    bound = round_bound([[-1.3, 7.4], [-3.1, 3.2], [-1.7, 2.3]], 0.32)
    gcfg = GridConfig(bound=bound)
    dcfg = DecoderConfig()
    rcfg = RenderConfig(n_samples=32, n_surface=16)
    intr = Intrinsics(H=680, W=1200, fx=600.0, fy=600.0, cx=599.5, cy=339.5)

    key = jax.random.PRNGKey(0)
    kg, kd, key = jax.random.split(key, 3)
    grids = init_grids(kg, gcfg)
    params = init_nice_decoders(kd, dcfg)

    rng = np.random.default_rng(0)
    color = jnp.asarray(rng.random((680, 1200, 3), dtype=np.float32))
    depth = jnp.asarray(1.0 + 2.0 * rng.random((680, 1200),
                                               dtype=np.float32))
    cam7 = jnp.asarray([1.0, 0, 0, 0, 2.0, 0.0, 0.5])

    for expanded in (False, True):
        model = SceneModel(kind='nice', decoder=dcfg,
                           bound=jnp.asarray(gcfg.bound_np),
                           coarse_bound=jnp.asarray(gcfg.coarse_bound_np),
                           grid_shapes=static_grid_shapes(gcfg),
                           expanded=expanded)
        tag = 'expanded' if expanded else 'baseline'

        # tracking
        tcfg = TrackerConfig(pixels=200, iters=10)
        track_fn = make_track_frame(model=model, rcfg=rcfg, tcfg=tcfg,
                                    intr=intr)
        out = track_fn(params, grids, color, depth, cam7, key)
        jax.block_until_ready(out)
        n = 20
        t0 = time.perf_counter()
        for i in range(n):
            out = track_fn(params, grids, color, depth, cam7,
                           jax.random.fold_in(key, i))
        jax.block_until_ready(out)
        tms = (time.perf_counter() - t0) / n * 1e3
        print(f'[{tag}] track frame (200px x 10 iters): {tms:7.2f} ms')

        # mapping
        n_win, n_iters = 5, 60
        mcfg = MapperConfig(pixels=1000, iters=n_iters, fix_fine=True,
                            stage_lr=tuple(
                                (s, (0.005, 0.001, 0.1, 0.005, 0.005))
                                for s in ('coarse', 'middle', 'fine',
                                          'color')))
        map_fn = make_map_step(model=model, rcfg=rcfg, mcfg=mcfg, intr=intr,
                               n_frames=n_win, n_iters=n_iters,
                               pix_per_frame=1000 // n_win)
        opt_params = {
            'cams': jnp.tile(cam7, (n_win, 1)),
            'grids': grids,
            'dec': {'color': params['color']},
        }
        frozen = {k: v for k, v in params.items() if k != 'color'}
        colors = jnp.tile(color[None], (n_win, 1, 1, 1))
        depths = jnp.tile(depth[None], (n_win, 1, 1))
        lr_tab = jnp.asarray(lr_table(mcfg, n_iters, 1.0, True, True))
        stage_idx = jnp.asarray(stage_schedule(mcfg, n_iters, True))
        cam_mask = jnp.asarray([0.0] + [1.0] * (n_win - 1))

        out, _, losses = map_fn(opt_params, frozen, None, lr_tab, stage_idx,
                             cam_mask, colors, depths, key)
        jax.block_until_ready(losses)
        n = 5
        t0 = time.perf_counter()
        for i in range(n):
            out, _, losses = map_fn(opt_params, frozen, None, lr_tab,
                                 stage_idx, cam_mask, colors, depths,
                                 jax.random.fold_in(key, 100 + i))
        jax.block_until_ready(losses)
        mms = (time.perf_counter() - t0) / n * 1e3
        print(f'[{tag}] map call (1000px x 60 iters, window 5): '
              f'{mms:7.2f} ms  ({n_iters / (mms / 1e3):.1f} iters/s)')
        fps = 1.0 / (tms / 1e3 + mms / 1e3 / 5.0)
        print(f'[{tag}] e2e strict-schedule fps: {fps:.2f}')


if __name__ == '__main__':
    main()
