"""Offline trajectory + mesh replay.

Functional parity target: /root/reference/visualizer.py + src/tools/viz.py —
the reference opens an interactive Open3D window that replays the estimated
trajectory over the reconstructed mesh.  This environment is headless, so
the replay renders to an image sequence (and an mp4 when ffmpeg exists):
the latest mesh is depth-rendered from each estimated pose with the native
rasterizer and composited with the trajectory plot.

    python tools/visualizer.py configs/Replica/room0.yaml [--output O]
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument('config', type=str)
    parser.add_argument('--output', type=str, default=None)
    parser.add_argument('--stride', type=int, default=10)
    parser.add_argument('--save_video', action='store_true')
    args = parser.parse_args()

    from nice_slam_tpu.utils.config import load_config, intrinsics_from_cfg
    from nice_slam_tpu.utils.ckpt import latest_checkpoint, load_checkpoint
    from nice_slam_tpu.mesh.mesher import load_ply
    from nice_slam_tpu.mesh.native import rasterize_depth

    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    cfg = load_config(args.config, 'configs/nice_slam.yaml')
    output = args.output or cfg['data']['output']
    intr = intrinsics_from_cfg(cfg)

    ckpt = latest_checkpoint(os.path.join(output, 'ckpts'))
    if ckpt is None:
        raise SystemExit(f'no checkpoint under {output}/ckpts')
    state = load_checkpoint(ckpt)
    n = int(state['mapping_idx']) + 1
    est = state['estimate_c2w'][:n]

    meshes = sorted(
        f for f in os.listdir(os.path.join(output, 'mesh'))
        if f.endswith('.ply'))
    if not meshes:
        raise SystemExit(f'no mesh under {output}/mesh')
    verts, tris = load_ply(os.path.join(output, 'mesh', meshes[-1]))

    frames_dir = os.path.join(output, 'replay')
    os.makedirs(frames_dir, exist_ok=True)
    scale_w = 320.0 / intr.W
    h, w = int(intr.H * scale_w), 320
    for k, i in enumerate(range(0, n, args.stride)):
        c2w = est[i].astype(np.float64)
        # our camera looks along -z with y up; the rasterizer is CV (+z):
        # flip the y/z axes of the pose
        flip = np.diag([1.0, -1.0, -1.0, 1.0])
        w2c = np.linalg.inv(c2w @ flip)
        d = rasterize_depth(verts, tris, w2c.astype(np.float32),
                            intr.fx * scale_w, intr.fy * scale_w,
                            intr.cx * scale_w, intr.cy * scale_w, h, w)
        fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(9, 3.2))
        ax1.imshow(d, cmap='plasma')
        ax1.set_title(f'mesh depth @ frame {i}')
        ax1.axis('off')
        ax2.plot(est[:i + 1, 0, 3], est[:i + 1, 2, 3], 'b-')
        ax2.plot(est[i, 0, 3], est[i, 2, 3], 'ro')
        ax2.set_title('trajectory (x-z)')
        ax2.set_aspect('equal')
        fig.savefig(os.path.join(frames_dir, f'{k:05d}.jpg'), dpi=100,
                    bbox_inches='tight')
        plt.close(fig)
    print(f'replay frames in {frames_dir}')

    if args.save_video and shutil.which('ffmpeg'):
        out_mp4 = os.path.join(output, 'replay.mp4')
        subprocess.run(['ffmpeg', '-y', '-framerate', '10', '-i',
                        os.path.join(frames_dir, '%05d.jpg'), '-c:v',
                        'libx264', '-pix_fmt', 'yuv420p', out_mp4],
                       check=False, capture_output=True)
        print(f'video: {out_mp4}')


if __name__ == '__main__':
    main()
