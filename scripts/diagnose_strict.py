"""Why is strict-mode mapping slow in bench_sync_modes?

Runs a short strict session at the sync-mode bench budget under cProfile
and prints the top-cumtime host calls — whatever blocks on device compute
(or does unexpected host work) inside map_frame shows up here.

Usage: python scripts/diagnose_strict.py [n_frames]
"""
import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'tests'))


def main(n_frames=40):
    from util import make_test_cfg

    from nice_slam_tpu.engine.slam import SlamSystem
    from nice_slam_tpu.utils.compilation_cache import enable
    enable()

    cfg = make_test_cfg(n_frames=n_frames, h=680, w=1200)
    cfg['sync_method'] = 'strict'
    cfg['debug'] = {}
    cfg['synthetic']['n_frames'] = n_frames
    cfg['meshing']['resolution'] = 128
    cfg['tracking'].update(pixels=200, iters=10)
    cfg['mapping'].update(every_frame=5, keyframe_every=5,
                          mapping_window_size=5, pixels=1000,
                          iters_first=400, iters=60, mesh_freq=100000)
    cfg['rendering'].update(N_samples=32, N_surface=16)

    import jax
    jax.config.update('jax_log_compiles', True)
    slam = SlamSystem(cfg, nice=True, output='/tmp/nstpu_diag_strict',
                      verbose=False)
    # warm: run the first frames outside the profile (compiles)
    t0 = time.perf_counter()
    for idx in range(12):
        t1 = time.perf_counter()
        slam.step(idx)
        print(f'frame {idx}: {time.perf_counter() - t1:.2f} s '
              f'map_s={slam.timers.map_s:.1f}', flush=True)
    print(f'warmup 12 frames: {time.perf_counter() - t0:.1f} s', flush=True)

    prof = cProfile.Profile()
    t0 = time.perf_counter()
    prof.enable()
    for idx in range(12, n_frames):
        t1 = time.perf_counter()
        slam.step(idx)
        print(f'frame {idx}: {time.perf_counter() - t1:.2f} s '
              f'map_s={slam.timers.map_s:.1f}', flush=True)
    prof.disable()
    wall = time.perf_counter() - t0
    print(f'profiled {n_frames - 12} frames: {wall:.1f} s '
          f'({slam.timers.summary()})', flush=True)

    s = io.StringIO()
    pstats.Stats(prof, stream=s).sort_stats('cumulative').print_stats(35)
    print(s.getvalue())


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 40)
