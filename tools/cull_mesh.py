"""Cull a ground-truth mesh to the frames' visible region.

Functional parity target: /root/reference/src/tools/cull_mesh.py — remove
faces that fall outside every camera frustum of the trajectory, used to
prepare GT meshes for fair reconstruction evaluation.

    python tools/cull_mesh.py configs/Replica/room0.yaml \
        --input_mesh gt.ply --output_mesh gt_culled.ply
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument('config', type=str)
    parser.add_argument('--input_mesh', type=str, required=True)
    parser.add_argument('--output_mesh', type=str, default=None)
    args = parser.parse_args()

    from nice_slam_tpu.utils.config import load_config, intrinsics_from_cfg
    from nice_slam_tpu.io.datasets import get_dataset
    from nice_slam_tpu.mesh.mesher import load_ply, save_ply

    cfg = load_config(args.config, 'configs/nice_slam.yaml')
    intr = intrinsics_from_cfg(cfg)
    ds = get_dataset(cfg)
    verts, tris = load_ply(args.input_mesh)

    seen = np.zeros((len(verts),), dtype=bool)
    ones = np.ones((len(verts), 1))
    homo = np.concatenate([verts, ones], axis=1)
    for i in range(len(ds)):
        c2w = ds.poses[i].copy()
        c2w[:3, 3] *= ds.scale
        w2c = np.linalg.inv(c2w)
        cam = (homo @ w2c.T)[:, :3]
        z = cam[:, 2] + 1e-5
        u = (intr.fx * (-cam[:, 0]) + intr.cx * z) / z
        v = (intr.fy * cam[:, 1] + intr.cy * z) / z
        seen |= (u > 0) & (u < intr.W) & (v > 0) & (v < intr.H) & (z < 0)

    keep = seen[tris].any(axis=1)
    tris = tris[keep]
    used = np.unique(tris)
    remap = np.full((len(verts),), -1, dtype=np.int64)
    remap[used] = np.arange(len(used))
    out = args.output_mesh or args.input_mesh.replace('.ply', '_culled.ply')
    save_ply(out, verts[used], remap[tris].astype(np.int32))
    print(f'culled mesh saved to {out} '
          f'({keep.sum()}/{len(keep)} faces kept)')


if __name__ == '__main__':
    main()
