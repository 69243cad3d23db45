"""Per-config steady-state throughput at any reference budget.

Generalizes bench_tum.py: measures the compiled tracking and mapping
step rates at a named reference config's budgets (pixels/iters/window/
every_frame, frame size, scene bound) and prints the steady-state
s/frame of the strict schedule.

Usage: python scripts/bench_budget.py [scannet|apartment|tum|replica]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (H, W, fx, fy, cx, cy), bound, track(px, iters), map(px, iters, window,
# every) — from the reference's config tree (see BASELINE.md budget table)
BUDGETS = {
    'replica': ((680, 1200, 600.0, 600.0, 599.5, 339.5),
                [[-1.3, 7.4], [-3.1, 3.2], [-1.7, 2.3]],
                (200, 10), (1000, 60, 5, 5)),
    'scannet': ((480, 640, 577.6, 578.4, 318.9, 242.7),
                [[-0.2, 8.9], [-0.2, 9.0], [-0.2, 3.2]],
                (1000, 50), (5000, 60, 10, 5)),
    'tum': ((384, 512, 413.8, 413.2, 255.5, 191.5),
            [[-3.5, 3.0], [-3.0, 3.0], [-3.0, 3.0]],
            (5000, 200), (5000, 60, 10, 1)),
    'apartment': ((480, 640, 600.0, 600.0, 319.5, 239.5),
                  [[-5.5, 6.0], [-6.5, 5.5], [-3.0, 3.0]],
                  (200, 50), (5000, 60, 10, 5)),
}


def main(name='scannet'):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nice_slam_tpu.utils.compilation_cache import enable
    enable()
    jax.config.update('jax_default_matmul_precision', 'float32')

    from nice_slam_tpu.core.cameras import Intrinsics, tensor_from_c2w
    from nice_slam_tpu.engine.mapper import (
        MapperConfig, lr_table, make_map_step, stage_schedule)
    from nice_slam_tpu.engine.tracker import TrackerConfig, make_track_frame
    from nice_slam_tpu.models.decoders import (
        DecoderConfig, init_nice_decoders)
    from nice_slam_tpu.models.grids import (
        GridConfig, init_grids, prepare_grids, round_bound,
        static_grid_shapes)
    from nice_slam_tpu.render.renderer import RenderConfig, SceneModel

    (h, w, fx, fy, cx, cy), bound_raw, (t_px, t_it), (m_px, m_it, win,
                                                      every) = BUDGETS[name]
    # ScanNet/TUM grid lengths are finer (their yaml): middle .16 fine .08?
    # ScanNet uses middle 0.32/fine 0.16 like Replica; TUM 0.16/0.08.
    mid_len, fine_len = (0.16, 0.08) if name == 'tum' else (0.32, 0.16)
    bound = round_bound(bound_raw, 0.32)
    gcfg = GridConfig(bound=bound, middle_grid_len=mid_len,
                      fine_grid_len=fine_len, color_grid_len=fine_len)
    dcfg = DecoderConfig(
        mm_precision=os.environ.get('NSTPU_MM_PRECISION') or None)
    rcfg = RenderConfig(n_samples=32, n_surface=16)
    intr = Intrinsics(H=h, W=w, fx=fx, fy=fy, cx=cx, cy=cy)
    model = SceneModel(kind='nice', decoder=dcfg,
                       bound=jnp.asarray(gcfg.bound_np),
                       coarse_bound=jnp.asarray(gcfg.coarse_bound_np),
                       grid_shapes=static_grid_shapes(gcfg))
    key = jax.random.PRNGKey(0)
    kg, kd = jax.random.split(key)
    grids = init_grids(kg, gcfg)
    params = init_nice_decoders(kd, dcfg)
    rng = np.random.default_rng(0)
    color = jnp.asarray(rng.random((h, w, 3), dtype=np.float32))
    depth = jnp.asarray(1.0 + 2.0 * rng.random((h, w), dtype=np.float32))
    cam7 = jnp.asarray([1.0, 0, 0, 0, 0.5, 0.0, 0.5])

    # tracking (re-roll like bench.py)
    tg = jax.jit(lambda g: prepare_grids(g, model.grid_shapes,
                                         stage='color'))(grids)
    jax.block_until_ready(tg)
    track_s = float('inf')
    for salt in range(2):
        tcfg = TrackerConfig(pixels=t_px, iters=t_it, cam_lr=0.002)
        fn = make_track_frame(model=model, rcfg=rcfg, tcfg=tcfg, intr=intr,
                              salt=salt)
        out = fn(params, tg, color, depth, cam7, key)
        jax.block_until_ready(out)
        best = 1e9
        for i in range(3):
            t0 = time.perf_counter()
            out = fn(params, tg, color, depth, cam7,
                     jax.random.fold_in(key, i))
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        track_s = min(track_s, best)
        if track_s < t_it * 0.025:
            break

    # mapping
    mcfg = MapperConfig(pixels=m_px, iters=m_it, fix_fine=True,
                        window_size=win,
                        stage_lr=tuple(
                            (s, (0.005, 0.001, 0.1, 0.005, 0.005))
                            for s in ('coarse', 'middle', 'fine', 'color')))
    step = make_map_step(model=model, rcfg=rcfg, mcfg=mcfg, intr=intr,
                         n_frames=win, n_iters=m_it,
                         pix_per_frame=m_px // win)
    opt_params = {'cams': jnp.tile(cam7, (win, 1)), 'grids': grids,
                  'dec': {'color': params['color']}}
    frozen = {k: v for k, v in params.items() if k != 'color'}
    colors = jnp.tile(color[None], (win, 1, 1, 1))
    depths = jnp.tile(depth[None], (win, 1, 1))
    lr_tab = jnp.asarray(lr_table(mcfg, m_it, 1.0, True, True))
    stage_idx = jnp.asarray(stage_schedule(mcfg, m_it, True))
    cam_mask = jnp.asarray([0.0] + [1.0] * (win - 1))
    out = step(opt_params, frozen, None, lr_tab, stage_idx, cam_mask,
               colors, depths, key)
    jax.block_until_ready(out[2])
    best = 1e9
    for i in range(3):
        t0 = time.perf_counter()
        out = step(opt_params, frozen, None, lr_tab, stage_idx, cam_mask,
                   colors, depths, jax.random.fold_in(key, 10 + i))
        jax.block_until_ready(out[2])
        best = min(best, time.perf_counter() - t0)
    map_s = best

    s_per_frame = track_s + map_s / every
    print(json.dumps({
        'metric': f'{name}_budget_s_per_frame',
        'value': round(s_per_frame, 3),
        'track_s_per_frame': round(track_s, 3),
        'map_s_per_call': round(map_s, 3),
        'map_iters_per_s': round(m_it / map_s, 1),
        'every_frame': every,
    }))


if __name__ == '__main__':
    main(sys.argv[1] if len(sys.argv) > 1 else 'scannet')
