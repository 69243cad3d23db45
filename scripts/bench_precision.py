"""Decoder matmul-precision study: float32 (6-pass) vs bfloat16_3x vs bf16.

The session default pins every matmul at 'float32' — on TPU that is the
6-pass bf16 emulation, the slowest MXU mode.  DecoderConfig.mm_precision
scopes a cheaper precision to the decoder MLP stack only (pose math and
compositing keep f32).  This measures, per precision:

  1. iMAP* mapping iters/s at the Replica iMAP budget (hidden-256 MLP —
     the matmul-bound path where precision matters most).
  2. NICE mapping iters/s at the Replica budget (hidden-32, gather-bound).
  3. End-to-end NICE accuracy on the synthetic orbit (ATE over a short
     strict run) as the go/no-go gate for changing any default.

Usage: python scripts/bench_precision.py [n_map_iters]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PRECISIONS = ('float32', 'BF16_BF16_F32_X3', 'bfloat16')


def time_imap(n_iters, mm_precision):
    import jax
    import jax.numpy as jnp
    from nice_slam_tpu.core.cameras import Intrinsics, tensor_from_c2w
    from nice_slam_tpu.engine import mapper as M
    from nice_slam_tpu.models.decoders import DecoderConfig, init_imap_decoder
    from nice_slam_tpu.render.renderer import RenderConfig, SceneModel

    scale = 0.1
    intr = Intrinsics(H=680, W=1200, fx=600.0, fy=600.0, cx=599.5, cy=339.5)
    bound = jnp.asarray([[-1.3, 7.4], [-3.1, 3.2], [-1.7, 2.3]]) * scale
    dcfg = DecoderConfig(pos_embedding_method='nerf',
                         mm_precision=mm_precision)
    model = SceneModel(kind='imap', decoder=dcfg, bound=bound)
    rcfg = RenderConfig(n_samples=32, n_surface=0, n_importance=12,
                        occupancy=False, perturb=0.0)
    n_frames, pixels = 5, 5000
    mcfg = M.MapperConfig(pixels=pixels, iters=n_iters, ba=True,
                          window_size=n_frames, keyframe_selection='global',
                          w_color_loss=0.1,
                          max_rays_per_pass=4096)
    key = jax.random.PRNGKey(0)
    params = init_imap_decoder(key, dcfg)
    step = M.make_map_step(model=model, rcfg=rcfg, mcfg=mcfg, intr=intr,
                           n_frames=n_frames, n_iters=n_iters,
                           pix_per_frame=pixels // n_frames)
    rng = np.random.default_rng(0)
    colors = jnp.asarray(rng.random((n_frames, intr.H, intr.W, 3)),
                         dtype=jnp.float32)
    depths = jnp.asarray(1.0 + rng.random((n_frames, intr.H, intr.W)) * 2.0,
                         dtype=jnp.float32) * scale
    cams = jax.vmap(tensor_from_c2w)(jnp.eye(4)[None].repeat(n_frames, 0))
    opt_params = {'cams': cams, 'grids': {}, 'dec': {'imap': params}}
    lr_tab = jnp.asarray(M.lr_table(mcfg, n_iters, 1.0, nice=False,
                                    ba_active=True))
    stage_idx = jnp.asarray(M.stage_schedule(mcfg, n_iters, nice=False))
    cam_mask = jnp.ones((n_frames,)).at[0].set(0.0)

    def run():
        out, _, losses = step(opt_params, {}, None, lr_tab, stage_idx,
                              cam_mask, colors, depths, key)
        jax.block_until_ready(losses)
        return losses

    losses = run()  # compile
    t0 = time.perf_counter()
    losses = run()
    dt = time.perf_counter() - t0
    return n_iters / dt, float(np.asarray(losses)[-1])


def orbit_ate(mm_precision, n_frames=8):
    """Short strict synthetic-orbit run; returns mean per-frame error (m)."""
    from tests.util import make_test_cfg
    from nice_slam_tpu.engine.slam import SlamSystem
    cfg = make_test_cfg(n_frames=n_frames, h=120, w=160)
    cfg['model']['decoder_matmul_precision'] = mm_precision
    out = f'/tmp/nstpu_prec_{mm_precision or "none"}'
    slam = SlamSystem(cfg, nice=True, output=out, seed=0)
    slam.run()
    est = np.asarray(slam.estimate_c2w)[:n_frames]
    gt = np.asarray(slam.gt_c2w)[:n_frames]
    return float(np.mean(np.linalg.norm(est[1:, :3, 3] - gt[1:, :3, 3],
                                        axis=-1)))


def main():
    n_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    import jax
    from nice_slam_tpu.utils.compilation_cache import enable
    enable()
    jax.config.update('jax_default_matmul_precision', 'float32')
    print(f'device: {jax.devices()[0].device_kind}')

    for prec in PRECISIONS:
        mm = None if prec == 'float32' else prec
        its, loss = time_imap(n_iters, mm)
        print(f'imap map [{prec:16s}]: {its:7.1f} iters/s '
              f'(final loss {loss:.4f})', flush=True)
    for prec in PRECISIONS:
        mm = None if prec == 'float32' else prec
        err = orbit_ate(mm)
        print(f'orbit NICE e2e [{prec:16s}]: mean traj err {err * 100:.3f} cm',
              flush=True)


if __name__ == '__main__':
    main()
