"""Sync-mode comparison on real hardware: strict vs loose (vs free).

VERDICT r1 weak #7 / next #9: the overlapped modes had only been
exercised on virtual CPU devices.  This runs the SAME 100-frame synthetic
sequence at Replica-like budgets under each sync mode on the actual
device stack (1 chip: tracking and mapping share the chip but dispatch
asynchronously in loose/free; 2+ chips: mapping runs on device 1 with
D2D snapshots) and reports wall-clock + accuracy side by side.

Usage: python scripts/bench_sync_modes.py [n_frames] [modes...]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'tests'))


def run_mode(mode, n_frames):
    import numpy as np
    from util import make_test_cfg

    from nice_slam_tpu.engine.slam import SlamSystem

    cfg = make_test_cfg(n_frames=n_frames, h=680, w=1200)
    cfg['sync_method'] = mode
    # this script MEASURES the modes, so 'free' must stay genuine free —
    # without the override the orchestrator's measured one-chip fence
    # (BASELINE.md round-4 rows: free 328 s vs loose 174 s at equal
    # accuracy) would silently alias it to loose
    cfg['sync_force_free'] = True
    cfg['debug'] = {}
    cfg['synthetic']['n_frames'] = n_frames
    cfg['meshing']['resolution'] = 128
    cfg['tracking'].update(pixels=200, iters=10)
    cfg['mapping'].update(every_frame=5, keyframe_every=5,
                          mapping_window_size=5, pixels=1000,
                          iters_first=400, iters=60, mesh_freq=100000)
    cfg['rendering'].update(N_samples=32, N_surface=16)

    t0 = time.perf_counter()
    slam = SlamSystem(cfg, nice=True,
                      output=f'/tmp/nstpu_sync_{mode}', verbose=False)
    slam.run()
    wall = time.perf_counter() - t0

    t_err = np.linalg.norm(
        slam.estimate_c2w[:, :3, 3] - slam.gt_c2w[:, :3, 3], axis=-1)
    # Horn-aligned ATE RMSE — the statistic the paper reports
    from nice_slam_tpu.eval.ate import evaluate_ate
    ate = evaluate_ate(slam.estimate_c2w, slam.gt_c2w)
    return {
        'mode': mode,
        'wall_s': round(wall, 1),
        'fps_incl_compiles': round(n_frames / wall, 2),
        'max_terr_m': round(float(t_err.max()), 4),
        'mean_terr_m': round(float(t_err.mean()), 4),
        'ate_rmse_m': round(
            float(ate['absolute_translational_error.rmse']), 5),
        **slam.timers.summary(),
    }


def main():
    from nice_slam_tpu.utils.compilation_cache import enable
    enable()
    args = [a for a in sys.argv[1:]]
    n = int(args[0]) if args and args[0].isdigit() else 100
    modes = [a for a in args if not a.isdigit()] or ['strict', 'loose']
    for mode in modes:
        print(json.dumps(run_mode(mode, n)), flush=True)


if __name__ == '__main__':
    main()
