"""Reconstruction evaluation CLI.

Functional parity target: /root/reference/src/tools/eval_recon.py __main__
(:213-231):

    python tools/eval_recon.py --rec_mesh out/mesh/final_mesh_eval_rec.ply \
        --gt_mesh gt/room0.ply [-2d] [-3d]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument('--rec_mesh', type=str, required=True)
    parser.add_argument('--gt_mesh', type=str, required=True)
    parser.add_argument('-2d', dest='metric_2d', action='store_true')
    parser.add_argument('-3d', dest='metric_3d', action='store_true')
    parser.add_argument('--n_imgs', type=int, default=1000)
    parser.add_argument('--view_sampling', type=str, default='reference',
                        choices=['reference', 'uniform'],
                        help="'reference' reproduces the paper's view "
                             "measure (OBB-sampled origins + unseen-point "
                             "rejection when *_pc_unseen.npy exists next "
                             "to the GT mesh)")
    args = parser.parse_args()

    from nice_slam_tpu.mesh.mesher import load_ply
    from nice_slam_tpu.eval.recon import calc_2d_metric, calc_3d_metric

    rec_v, rec_t = load_ply(args.rec_mesh)
    gt_v, gt_t = load_ply(args.gt_mesh)

    if args.metric_3d:
        m = calc_3d_metric(rec_v, rec_t, gt_v, gt_t)
        for k, v in m.items():
            print(f'{k}: {v:.4f}')
    if args.metric_2d:
        import numpy as np
        # the reference's culled-GT release ships an unseen-region point
        # cloud next to each mesh (eval_recon.py:146-147)
        unseen_path = args.gt_mesh.replace('.ply', '_pc_unseen.npy')
        unseen = np.load(unseen_path) if os.path.isfile(unseen_path) \
            else None
        m = calc_2d_metric(rec_v, rec_t, gt_v, gt_t, n_imgs=args.n_imgs,
                           view_sampling=args.view_sampling,
                           unseen_pts=unseen)
        for k, v in m.items():
            print(f'{k}: {v}')


if __name__ == '__main__':
    main()
