"""Bisect the iMAP map-step device fault (UNAVAILABLE on v5e).

Runs the Replica-iMAP-budget map step (5 frames x 1000 px, 10 iters)
under a sequence of ablations and reports which construct faults:

  full        — as shipped (32 samples + 12 importance + regulation + BA)
  no_reg      — regulation_sigma_batched stubbed to zeros (no extra decode)
  no_imp      — n_importance = 0 (no sample_pdf / _permute_rows merge)
  neither     — both off
  track_only  — the tracking step (known-good reference point)

Usage: python scripts/isolate_imap_fault.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def try_step(label, *, stub_reg, n_importance, n_iters=10):
    import jax
    import jax.numpy as jnp
    from nice_slam_tpu.core.cameras import Intrinsics, tensor_from_c2w
    from nice_slam_tpu.engine import mapper as M
    from nice_slam_tpu.models.decoders import DecoderConfig, init_imap_decoder
    from nice_slam_tpu.render import renderer as R
    from nice_slam_tpu.render.renderer import RenderConfig, SceneModel

    orig = R.regulation_sigma_batched
    if stub_reg:
        def stub(params, grids, o, d, dep, *, model, rcfg, keys, stage):
            return jnp.zeros((o.shape[0] * o.shape[1] * rcfg.n_samples,))
        R.regulation_sigma_batched = stub
        M.regulation_sigma_batched = stub
    try:
        scale = 0.1
        intr = Intrinsics(H=680, W=1200, fx=600.0, fy=600.0, cx=599.5,
                          cy=339.5)
        bound = jnp.asarray([[-1.3, 7.4], [-3.1, 3.2], [-1.7, 2.3]]) * scale
        dcfg = DecoderConfig(pos_embedding_method='nerf')
        model = SceneModel(kind='imap', decoder=dcfg, bound=bound)
        rcfg = RenderConfig(n_samples=32, n_surface=0,
                            n_importance=n_importance,
                            occupancy=False, perturb=0.0)
        n_frames, pixels = 5, 1000
        mcfg = M.MapperConfig(pixels=pixels, iters=n_iters, ba=True,
                              window_size=n_frames,
                              keyframe_selection='global', w_color_loss=0.1)
        key = jax.random.PRNGKey(0)
        params = init_imap_decoder(key, dcfg)
        step = M.make_map_step(model=model, rcfg=rcfg, mcfg=mcfg, intr=intr,
                               n_frames=n_frames, n_iters=n_iters,
                               pix_per_frame=pixels // n_frames)
        rng = np.random.default_rng(0)
        colors = jnp.asarray(rng.random((n_frames, intr.H, intr.W, 3)),
                             dtype=jnp.float32)
        depths = jnp.asarray(
            1.0 + rng.random((n_frames, intr.H, intr.W)) * 2.0,
            dtype=jnp.float32) * scale
        cams = jax.vmap(tensor_from_c2w)(jnp.eye(4)[None].repeat(n_frames, 0))
        opt_params = {'cams': cams, 'grids': {}, 'dec': {'imap': params}}
        lr_tab = jnp.asarray(M.lr_table(mcfg, n_iters, 1.0, nice=False,
                                        ba_active=True))
        stage_idx = jnp.asarray(M.stage_schedule(mcfg, n_iters, nice=False))
        cam_mask = jnp.ones((n_frames,)).at[0].set(0.0)
        t0 = time.perf_counter()
        out, _, losses = step(opt_params, {}, None, lr_tab, stage_idx,
                              cam_mask, colors, depths, key)
        jax.block_until_ready(losses)
        print(f'{label}: OK in {time.perf_counter() - t0:.1f} s '
              f'(loss {float(losses[-1]):.3f})', flush=True)
        return True
    except Exception as e:
        print(f'{label}: FAULT {type(e).__name__}: {str(e)[:100]}',
              flush=True)
        return False
    finally:
        R.regulation_sigma_batched = orig
        M.regulation_sigma_batched = orig


def main():
    import jax
    jax.config.update('jax_default_matmul_precision', 'float32')
    print(f'device: {jax.devices()[0].device_kind}', flush=True)
    try_step('full', stub_reg=False, n_importance=12)
    try_step('no_reg', stub_reg=True, n_importance=12)
    try_step('no_imp', stub_reg=False, n_importance=0)
    try_step('neither', stub_reg=True, n_importance=0)


if __name__ == '__main__':
    main()
