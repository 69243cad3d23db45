"""Round-5 study: today's tracking-binary compile-draw distribution.

BENCH_r05 context: three bench.py runs measured track_ms_per_frame
8.1 / 16.7 / 16.2 vs the round-3 window's 5.5-5.7 ms — all three under the
autotune accept threshold (25 ms at the Replica budget), so no re-roll
fired.  This compiles the SAME Replica-budget tracking program with salts
0..N-1 and times each binary (value-fetch barrier, best of 5 reps) to see
whether good (~6-8 ms) binaries still exist in today's draw pool and what
accept threshold separates them.

Usage: python scripts/studies/proto_track_draws.py [n_draws]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def main():
    n_draws = int(sys.argv[1]) if len(sys.argv) > 1 else 8
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
    tcfg = TrackerConfig(pixels=200, iters=10, cam_lr=0.001,
                         separate_lr=True, ignore_edge_w=20,
                         ignore_edge_h=20)

    times = []
    for s in range(n_draws):
        fn = make_track_frame(model=model, rcfg=rcfg, tcfg=tcfg,
                              intr=intr, salt=s)
        t_c0 = time.perf_counter()
        out = fn(params, grids, color, depth, cam7, key)
        float(out[2][-1])
        compile_s = time.perf_counter() - t_c0
        best = np.inf
        for _ in range(5):
            t0 = time.perf_counter()
            out = fn(params, grids, color, depth, cam7,
                     jax.random.fold_in(key, 1))
            float(out[2][-1])          # value fetch = real barrier
            best = min(best, time.perf_counter() - t0)
        times.append(best * 1e3)
        print(f'salt {s}: {best * 1e3:.2f} ms/frame '
              f'(compile {compile_s:.1f} s)', flush=True)
    print('distribution ms:', ' '.join(f'{t:.1f}' for t in sorted(times)))


if __name__ == '__main__':
    main()
