"""TUM fr1/desk-budget throughput: the reference's heaviest config.

Budget (configs/TUM_RGBD/tum.yaml + freiburg1_desk.yaml): tracking
5000 px x 200 iters per frame at 480x640 (crop_edge 8 -> 464x624,
crop_size 384x512 scaled), mapping 5000 px x 60 iters window 10 EVERY
frame.  Grid shapes use the fr1/desk bound, whose fine+color plane
previously overflowed the fold kernel's VMEM (round 1 fell back to XLA);
the y-chunked kernels now stream it.

Prints per-phase device times and the steady-state s/frame.

Usage: python scripts/bench_tum.py
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

    from nice_slam_tpu.core.cameras import Intrinsics, tensor_from_c2w
    from nice_slam_tpu.engine import mapper as M
    from nice_slam_tpu.engine import tracker as T
    from nice_slam_tpu.models.decoders import (
        DecoderConfig, init_nice_decoders)
    from nice_slam_tpu.models.grids import (
        GridConfig, init_grids, round_bound, static_grid_shapes)
    from nice_slam_tpu.models.grids import prepare_grids
    from nice_slam_tpu.ops.pallas.expand import (
        _plane_bytes, _VMEM_LIMIT_BYTES)
    from nice_slam_tpu.render.renderer import RenderConfig, SceneModel

    # fr1/desk: bound [[-4.6,2.6],[-3.3,3.2],[-2.0,4.9]] with grid_len
    # middle 0.16 / fine+color 0.08 — the reference's ACTUAL TUM grids
    # (/root/reference/configs/TUM_RGBD/tum.yaml:grid_len,
    # freiburg1_desk.yaml:mapping.bound).  Rounds r1-r3 benched a
    # half-resolution stand-in (middle 0.32/fine 0.16, smaller bound);
    # pass --small to reproduce those rows.
    if '--small' in sys.argv:
        bound = round_bound([[-3.5, 3.0], [-3.0, 3.0], [-3.0, 3.0]], 0.32)
        gcfg = GridConfig(bound=bound)
    else:
        bound = round_bound([[-4.6, 2.6], [-3.3, 3.2], [-2.0, 4.9]], 0.32)
        gcfg = GridConfig(bound=bound, middle_grid_len=0.16,
                          fine_grid_len=0.08, color_grid_len=0.08)
    # NSTPU_MM_PRECISION scopes a cheaper matmul precision to the decoder
    # stack (DecoderConfig.mm_precision; scripts/bench_precision.py
    # measured bf16 at 2x f32 on the iMAP MLP with no e2e accuracy loss)
    dcfg = DecoderConfig(
        mm_precision=os.environ.get('NSTPU_MM_PRECISION') or None)
    rcfg = RenderConfig(n_samples=32, n_surface=16)
    intr = Intrinsics(H=384, W=512, fx=517.3 * 512 / 640, fy=516.5 * 384
                      / 480, cx=255.5, cy=191.5)
    model = SceneModel(kind='nice', decoder=dcfg,
                       bound=jnp.asarray(gcfg.bound_np),
                       coarse_bound=jnp.asarray(gcfg.coarse_bound_np),
                       grid_shapes=static_grid_shapes(gcfg))
    shapes = dict(model.grid_shapes)
    fine_shape = shapes['fine']
    print(f"fine grid {fine_shape}; fold-kernel plane estimate "
          f"{_plane_bytes(fine_shape[1], fine_shape[2], 64) / 1e6:.1f} MB "
          f"(VMEM limit {_VMEM_LIMIT_BYTES / 1e6:.0f} MB -> "
          f"{'CHUNKED' if _plane_bytes(fine_shape[1], fine_shape[2], 64) > _VMEM_LIMIT_BYTES else 'single-plane'} kernels)")

    key = jax.random.PRNGKey(0)
    kg, kd, key = jax.random.split(key, 3)
    grids = init_grids(kg, gcfg)
    params = init_nice_decoders(kd, dcfg)

    rng = np.random.default_rng(0)
    color = jnp.asarray(rng.random((intr.H, intr.W, 3), dtype=np.float32))
    depth = jnp.asarray(0.5 + 2.0 * rng.random((intr.H, intr.W),
                                               dtype=np.float32))
    cam7 = jnp.asarray([1.0, 0, 0, 0, 0.0, 0.0, 0.5])

    # ---- tracking 5000 px x 200 iters ----
    tcfg = T.TrackerConfig(pixels=5000, iters=200, handle_dynamic=True)
    track_grids = jax.jit(
        lambda g: prepare_grids(g, model.grid_shapes, stage='color'))(grids)
    best = float('inf')
    for salt in range(2):
        fn = T.make_track_frame(model=model, rcfg=rcfg, tcfg=tcfg,
                                intr=intr, salt=salt)
        jax.block_until_ready(
            fn(params, track_grids, color, depth, cam7, key)[2])
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            out = fn(params, track_grids, color, depth, cam7,
                     jax.random.fold_in(key, i))
            jax.block_until_ready(out[2])
            ts.append(time.perf_counter() - t0)
        best = min(best, min(ts))
    print(f'tracking: {best:.3f} s/frame (200 iters x 5000 px)')

    # ---- ray-sharded tracking overhead + multi-chip projection ----
    # `--track-mesh` runs the SAME budget through the parallel.track: rays
    # program on a 1-device mesh (the only mesh this 1-chip environment
    # can measure): the delta vs the plain program is the per-iteration
    # sharding overhead (shard_map plumbing + the [5000]-float residual
    # all_gather + the psum pair, which on 1 device compile away to
    # copies).  The projection model splits the measured single-chip
    # per-iter cost into the ray-parallel part (gather+MLP decode, scales
    # 1/N per the round-4 row-gather cost law) and that fixed overhead.
    if '--track-mesh' in sys.argv:
        from nice_slam_tpu.parallel.mesh import make_ray_mesh
        from nice_slam_tpu.parallel.sharded import make_sharded_track_frame
        n_mesh = int(sys.argv[sys.argv.index('--track-mesh') + 1])
        mesh = make_ray_mesh(n_mesh)
        best_sh = float('inf')
        for salt in range(2):
            fn = make_sharded_track_frame(mesh=mesh, model=model,
                                          rcfg=rcfg, tcfg=tcfg, intr=intr,
                                          salt=salt)
            jax.block_until_ready(
                fn(params, track_grids, color, depth, cam7, key)[2])
            for i in range(3):
                t0 = time.perf_counter()
                out = fn(params, track_grids, color, depth, cam7,
                         jax.random.fold_in(key, i))
                jax.block_until_ready(out[2])
                best_sh = min(best_sh, time.perf_counter() - t0)
        over = best_sh - best
        print(f'tracking (rays-sharded, {n_mesh}-device mesh): '
              f'{best_sh:.3f} s/frame — mesh overhead '
              f'{over * 1e3:+.0f} ms/frame ({over / tcfg.iters * 1e3:+.2f} '
              f'ms/iter) vs the plain program')
        t_fixed = max(over, 0.0)
        for n in (2, 4, 8):
            proj = best / n + t_fixed
            print(f'  projected track s/frame at {n} chips: '
                  f'{proj:.2f} (ray part {best / n:.2f} + fixed '
                  f'{t_fixed:.2f})')

    # ---- mapping 5000 px x 60 iters window 10, EVERY frame ----
    n_win, n_iters = 10, 60
    mcfg = M.MapperConfig(pixels=5000, iters=n_iters, fix_fine=True,
                          window_size=n_win,
                          stage_lr=tuple(
                              (s, (0.005, 0.001, 0.1, 0.005, 0.005))
                              for s in ('coarse', 'middle', 'fine',
                                        'color')))
    map_fn = M.make_map_step(model=model, rcfg=rcfg, mcfg=mcfg, intr=intr,
                             n_frames=n_win, n_iters=n_iters,
                             pix_per_frame=5000 // n_win)
    opt_params = {'cams': jnp.tile(cam7, (n_win, 1)), 'grids': grids,
                  'dec': {'color': params['color']}}
    frozen = {k: v for k, v in params.items() if k != 'color'}
    colors = jnp.tile(color[None], (n_win, 1, 1, 1))
    depths = jnp.tile(depth[None], (n_win, 1, 1))
    lr_tab = jnp.asarray(M.lr_table(mcfg, n_iters, 1.0, True, True))
    stage_idx = jnp.asarray(M.stage_schedule(mcfg, n_iters, True))
    cam_mask = jnp.asarray([0.0] + [1.0] * (n_win - 1))

    def run_map(k):
        _, _, losses = map_fn(opt_params, frozen, None, lr_tab, stage_idx,
                              cam_mask, colors, depths, k)
        return losses

    jax.block_until_ready(run_map(key))
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        out = run_map(jax.random.fold_in(key, 10 + i))
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    map_s = min(ts)
    print(f'mapping: {map_s:.3f} s/frame (60 iters x 5000 px window 10, '
          f'every frame) = {n_iters / map_s:.1f} iters/s')
    print(f'steady state: {best + map_s:.2f} s/frame '
          f'(track {best:.2f} + map {map_s:.2f})')


if __name__ == '__main__':
    main()
