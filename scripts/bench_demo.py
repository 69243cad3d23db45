"""End-to-end wall-clock at the reference Demo budget (500 frames).

The reference's only stated end-to-end number is the Demo run: a 500-frame
ScanNet subset that "takes a few minutes" on a ~5 GB GPU
(/root/reference/README.md:149, configs/Demo/demo.yaml).  This script runs
the full system — tracking 1000 px x 30 iters, mapping 1000 px x 10 iters
every 10 frames (window 10), coarse mapper, sync_method loose, 256^3 mesh
every 50 frames, checkpoint at the end — on 500 synthetic 480x640 frames
and reports total wall time including compiles.

Usage: python scripts/bench_demo.py [n_frames] [--pretrained] [--sync=MODE]

--sync overrides the Demo config's loose sync (strict isolates whether the
back-half pose drift is a sync-staleness effect or a budget limit)

--pretrained consumes the repo blobs (pretrained/coarse.pt,
pretrained/middle_fine.pt, written by tools/pretrain_decoders.py) in the
reference's pretrained mode: middle+fine+coarse decoders frozen, bare
1e-10 tracking variance epsilon.  The from-scratch run (default) is the
round-1 configuration whose back-half accuracy drifted at this light
budget (BASELINE.md).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'tests'))


def main(n_frames=500, pretrained=False, sync='loose'):
    import numpy as np
    from util import make_test_cfg

    from nice_slam_tpu.engine.slam import SlamSystem

    cfg = make_test_cfg(n_frames=n_frames, h=480, w=640)
    cfg['sync_method'] = sync
    cfg['debug'] = {}
    cfg['synthetic']['n_frames'] = n_frames
    cfg['meshing']['resolution'] = 256
    t = cfg['tracking']
    t.update(pixels=1000, iters=30, lr=0.0005, ignore_edge_W=20,
             ignore_edge_H=20)
    m = cfg['mapping']
    m.update(every_frame=10, mesh_freq=50, ckpt_freq=500, keyframe_every=50,
             mapping_window_size=10, pixels=1000, iters_first=400, iters=10)
    if pretrained:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        cfg['pretrained_decoders'] = {
            'coarse': os.path.join(root, 'pretrained', 'coarse.pt'),
            'middle_fine': os.path.join(root, 'pretrained',
                                        'middle_fine.pt')}
        cfg['mapping'].update(fix_fine=True, train_middle=False)
        cfg['tracking']['var_floor'] = 1.0e-10
    out = '/tmp/nstpu_demo_bench'

    t0 = time.perf_counter()
    slam = SlamSystem(cfg, nice=True, output=out, verbose=False)
    slam.run()
    total_s = time.perf_counter() - t0

    t_err = np.linalg.norm(
        slam.estimate_c2w[:, :3, 3] - slam.gt_c2w[:, :3, 3], axis=-1)
    summ = slam.timers.summary()
    print(json.dumps({
        'metric': 'demo_500_wall_s',
        'pretrained': pretrained,
        'sync': sync,
        'value': round(total_s, 1),
        'unit': 's',
        'frames': n_frames,
        'fps_incl_compiles': round(n_frames / total_s, 2),
        'ate_like_max_terr_m': round(float(t_err.max()), 4),
        'ate_like_mean_terr_m': round(float(t_err.mean()), 4),
        **summ,
    }))


if __name__ == '__main__':
    sync = 'loose'
    args = []
    for a in sys.argv[1:]:
        if a == '--pretrained':
            continue
        if a.startswith('--sync='):
            sync = a.split('=', 1)[1]
            continue
        args.append(a)
    main(int(args[0]) if args else 500,
         pretrained='--pretrained' in sys.argv, sync=sync)
