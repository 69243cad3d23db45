"""Offline trajectory + mesh replay.

Functional parity target: /root/reference/visualizer.py + src/tools/viz.py —
the reference opens an interactive Open3D window that replays the estimated
trajectory over the reconstructed mesh.  This environment is headless, so
the replay renders to an image sequence (and an mp4 when ffmpeg exists):
each replayed pose shows the scene model's RENDERED COLOR (the full
volume renderer on the checkpoint's grids+decoders), the latest mesh's
depth from the native rasterizer, and the trajectory plot.  --no-rgb
skips the volume renders (they are the expensive part).

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
    parser.add_argument('--no-rgb', dest='rgb', action='store_false',
                        help='skip volume-rendered color panels')
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

    renderer = None
    if args.rgb:
        import jax
        import jax.numpy as jnp
        from nice_slam_tpu.render.renderer import render_image
        from nice_slam_tpu.utils.config import (
            get_model, render_config_from_cfg)
        model, _, _ = get_model(cfg, nice=True)
        rcfg = render_config_from_cfg(cfg)
        grids = {k: jnp.asarray(v).reshape(-1, v.shape[-1])
                 for k, v in state['grids'].items()}
        params = jax.tree.map(jnp.asarray,
                              {**state['frozen_dec'], **state['opt_dec']})
        rintr = intr.scaled_to(max(int(intr.H * 320.0 / intr.W) // 2 * 2, 2),
                               320)

        def renderer(c2w):
            _, _, color = render_image(params, grids, jnp.asarray(c2w),
                                       rintr, stage='color', model=model,
                                       rcfg=rcfg)
            return np.clip(np.asarray(color), 0, 1)

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
        ncols = 3 if renderer is not None else 2
        fig, axs = plt.subplots(1, ncols, figsize=(4.5 * ncols, 3.2))
        col = 0
        if renderer is not None:
            axs[col].imshow(renderer(c2w))
            axs[col].set_title(f'rendered color @ frame {i}')
            axs[col].axis('off')
            col += 1
        axs[col].imshow(d, cmap='plasma')
        axs[col].set_title(f'mesh depth @ frame {i}')
        axs[col].axis('off')
        col += 1
        axs[col].plot(est[:i + 1, 0, 3], est[:i + 1, 2, 3], 'b-')
        axs[col].plot(est[i, 0, 3], est[i, 2, 3], 'ro')
        axs[col].set_title('trajectory (x-z)')
        axs[col].set_aspect('equal')
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
