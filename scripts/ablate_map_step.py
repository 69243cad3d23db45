"""In-situ attribution of the mapping step cost by ablation.

The per-component microbenchmarks (profile_map_breakdown.py) do not add up
to the whole — XLA fuses and overlaps across component boundaries — so this
script measures the REAL compiled 60-iteration map step (Replica budget:
1000 px, window 5, stage schedule middle/fine/color) and then re-measures it
with one piece ablated at a time:

  full            the production make_map_step program
  no_grid_grad    stop_gradient on the grids inside the loss (kills the
                  gather VJP scatter + expansion fold + grid Adam traffic)
  no_dec_grad     decoders not optimized (no dW matmuls / dec Adam)
  no_cam_grad     camera tensors not optimized (no grad through ray gen /
                  near-far / sort permutation)
  no_sort         z concat without the 48-lane sort (WRONG math — timing only)
  frozen_expand   grids expanded once outside the scan (stale features after
                  each Adam step — WRONG math — isolates per-iter expansion)
  fwd_only        loss only, no grad/Adam (scan carries the loss sum)

The difference (full - ablated) is that component's true in-situ cost.

Usage: python scripts/ablate_map_step.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ITERS = 60
N_FRAMES = 5
PIXELS = 1000


def main():
    import jax
    import jax.numpy as jnp

    from nice_slam_tpu.utils.compilation_cache import enable
    enable()
    jax.config.update('jax_default_matmul_precision', 'float32')

    from nice_slam_tpu.core.cameras import Intrinsics
    from nice_slam_tpu.engine import mapper as M
    from nice_slam_tpu.models.decoders import (
        DecoderConfig, init_nice_decoders)
    from nice_slam_tpu.models.grids import (
        GridConfig, init_grids, round_bound, static_grid_shapes)
    from nice_slam_tpu.render import renderer as R
    from nice_slam_tpu.render.renderer import RenderConfig, SceneModel
    from nice_slam_tpu.utils.optim import adam_init, adam_update

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
    grids = init_grids(kg, gcfg)
    params = init_nice_decoders(kd, dcfg)

    mcfg = M.MapperConfig(
        pixels=PIXELS, iters=N_ITERS, window_size=N_FRAMES,
        stage_lr=(('coarse', (0.0, 0.0, 0.0, 0.0, 0.0)),
                  ('middle', (0.0, 0.0, 0.1, 0.0, 0.0)),
                  ('fine', (0.0, 0.0, 0.005, 0.005, 0.0)),
                  ('color', (0.005, 0.0, 0.005, 0.005, 0.005))))
    pix_per_frame = PIXELS // N_FRAMES

    # synthetic window data
    colors = jax.random.uniform(kc, (N_FRAMES, intr.H, intr.W, 3))
    depths = jnp.full((N_FRAMES, intr.H, intr.W), 1.5)
    cam7s = jnp.tile(jnp.asarray([1.0, 0, 0, 0, 2.0, 0.0, 0.3]), (N_FRAMES, 1))
    cam_mask = jnp.asarray([0.0] + [1.0] * (N_FRAMES - 1))
    opt_dec = {'fine': params['fine'], 'color': params['color']}
    frozen = {k: v for k, v in params.items() if k not in opt_dec}
    opt_params = {'cams': cam7s, 'grids': grids, 'dec': opt_dec}
    lr_tab = jnp.asarray(M.lr_table(mcfg, N_ITERS, 1.0, True, True))
    stage_idx = jnp.asarray(M.stage_schedule(mcfg, N_ITERS, True))

    def run_case(label, map_fn):
        out = map_fn(opt_params, frozen, None, lr_tab, stage_idx, cam_mask,
                     colors, depths, key)
        jax.block_until_ready(out)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            out = map_fn(opt_params, frozen, None, lr_tab, stage_idx,
                         cam_mask, colors, depths, key)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        ms = best * 1e3
        print(f'{label:18s} {ms:8.1f} ms / {N_ITERS} iters '
              f'= {ms / N_ITERS:6.3f} ms/iter')
        return ms

    def make_step(*, grid_grad=True, dec_grad=True, cam_grad=True,
                  fwd_only=False, frozen_expand=False, no_sort=False):
        branch_stages, loss_fns = M.build_stage_losses(
            model=model, rcfg=rcfg, mcfg=mcfg, intr=intr, n_frames=N_FRAMES,
            pix_per_frame=pix_per_frame)

        def wrap(loss_fn):
            def wrapped(opt_p, frozen_dec, colors, depths, k, pre_grids):
                if not grid_grad:
                    opt_p = {**opt_p,
                             'grids': jax.tree.map(jax.lax.stop_gradient,
                                                   opt_p['grids'])}
                if not dec_grad:
                    opt_p = {**opt_p,
                             'dec': jax.tree.map(jax.lax.stop_gradient,
                                                 opt_p['dec'])}
                if not cam_grad:
                    opt_p = {**opt_p,
                             'cams': jax.lax.stop_gradient(opt_p['cams'])}
                if frozen_expand:
                    # WRONG math (stale features) — timing isolation only
                    opt_p = {**opt_p, 'grids': pre_grids}
                return loss_fn(opt_p, frozen_dec, colors, depths, k)
            return wrapped

        loss_fns_w = [wrap(f) for f in loss_fns]
        grad_fns = [jax.value_and_grad(f) for f in loss_fns_w]

        def map_step(opt_params, frozen_dec, masks, lr_tab, stage_idx,
                     cam_mask, colors, depths, key):
            from nice_slam_tpu.models.grids import prepare_grids
            pre = None
            if frozen_expand:
                pre = prepare_grids(opt_params['grids'], model.grid_shapes)

            def body(carry, it):
                opt_p, opt_state = carry
                k = jax.random.fold_in(key, it)
                lrs = lr_tab[it]
                bidx = stage_idx[it] - 1
                if fwd_only:
                    loss = jax.lax.switch(
                        bidx, loss_fns_w, opt_p, frozen_dec, colors,
                        depths, k, pre)
                    return (opt_p, opt_state), loss
                loss, grads = jax.lax.switch(
                    bidx, grad_fns, opt_p, frozen_dec, colors, depths, k,
                    pre)
                lr_prefix = {
                    'cams': lrs[M.LR_CAM],
                    'grids': {name: lrs[1 + M.STAGE_ORDER.index(name)]
                              for name in opt_p['grids']},
                    'dec': {kk: lrs[M.LR_DECODERS] for kk in opt_p['dec']},
                }
                mask_prefix = {'cams': cam_mask[:, None], 'grids': 1.0,
                               'dec': 1.0}
                opt_p, opt_state = adam_update(
                    opt_p, grads, opt_state, lr_prefix, mask=mask_prefix)
                return (opt_p, opt_state), loss

            init = (opt_params, adam_init(opt_params))
            (out, _), losses = jax.lax.scan(body, init, jnp.arange(N_ITERS))
            return out, losses

        return jax.jit(map_step)

    import contextlib

    @contextlib.contextmanager
    def no_sort_patch():
        orig = jnp.sort
        R.jnp.sort = lambda x, axis=-1: x  # WRONG math — timing only
        try:
            yield
        finally:
            R.jnp.sort = orig

    t_full = run_case('full', make_step())
    run_case('fwd_only', make_step(fwd_only=True))
    run_case('no_grid_grad', make_step(grid_grad=False))
    run_case('no_dec_grad', make_step(dec_grad=False))
    run_case('no_cam_grad', make_step(cam_grad=False))
    run_case('frozen_expand', make_step(frozen_expand=True))
    with no_sort_patch():
        run_case('no_sort', make_step())
    print(f'\nfull = {t_full:.1f} ms; deltas vs full attribute each part.')


if __name__ == '__main__':
    main()
