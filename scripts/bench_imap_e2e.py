"""iMAP* end-to-end accuracy soak at the Replica-iMAP budgets.

Runs the full SLAM system in iMAP mode (single hidden-256 MLP, density
compositing, 12-sample importance resampling, free-space regulation,
StepLR decay) on the synthetic orbit at the reference's iMAP budgets
(configs/Replica/replica_imap.yaml + imap.yaml: track 5000 px x 50,
map 5000 px x 300 iters x 3 outer every 5 frames, iters_first 1500,
imap_decoders_lr 2e-4, mapping w_color 0.05, bf16 decoder matmuls) and
reports raw + Horn-aligned trajectory error.

The `scale` argument matters (measured, BASELINE.md): the fourier
embedding (gamma 25) assumes the reference's scaled coordinate range
(~0.8 units for an 8 m room at its scale 0.1).  For the 2 m synthetic
box, scale 0.4 lands in that range; scale 1 scores ~7x worse.

Usage: python scripts/bench_imap_e2e.py [n_frames] [scale]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'tests'))


def main(n=40, scale=0.4):
    import numpy as np
    from util import make_test_cfg

    from nice_slam_tpu.engine.slam import SlamSystem
    from nice_slam_tpu.eval.ate import evaluate_ate

    cfg = make_test_cfg(n_frames=n, nice=False, coarse=False, h=240, w=320)
    cfg['synthetic']['n_frames'] = n
    cfg['rendering'].update(N_samples=32, N_surface=0, N_importance=12)
    cfg['occupancy'] = False
    cfg['scale'] = scale
    cfg['tracking'].update(pixels=5000, iters=50, lr=0.001,
                           w_color_loss=0.5, handle_dynamic=False)
    cfg['mapping'].update(pixels=5000, iters=300, iters_first=1500,
                          every_frame=5, keyframe_every=5,
                          mapping_window_size=5,
                          keyframe_selection_method='global',
                          w_color_loss=0.05, imap_decoders_lr=0.0002)
    cfg['model']['decoder_matmul_precision'] = 'bfloat16'
    cfg['debug'] = {}

    t0 = time.perf_counter()
    slam = SlamSystem(cfg, nice=False, output='/tmp/nstpu_imap_e2e',
                      verbose=False)
    slam.run()
    wall = time.perf_counter() - t0
    t_err = np.linalg.norm(
        slam.estimate_c2w[:, :3, 3] - slam.gt_c2w[:, :3, 3], axis=-1)
    ate = evaluate_ate(slam.estimate_c2w, slam.gt_c2w)
    rmse_scaled = float(ate['absolute_translational_error.rmse'])
    print(json.dumps({
        'metric': 'imap_e2e_ate_rmse_m', 'frames': n, 'scale': scale,
        'wall_s': round(wall, 1),
        'value': round(rmse_scaled / scale, 5),     # real-world meters
        'ate_rmse_scaled_m': round(rmse_scaled, 5),
        'raw_mean_terr_scaled_m': round(float(t_err.mean()), 5),
        **slam.timers.summary()}))


if __name__ == '__main__':
    a = sys.argv[1:]
    main(int(a[0]) if a else 40, float(a[1]) if len(a) > 1 else 0.4)
