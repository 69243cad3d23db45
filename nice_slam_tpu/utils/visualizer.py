"""Per-iteration render panels (aux subsystem #5, debug imagery).

Functional parity target: /root/reference/src/utils/Visualizer.py:24-107 —
every `freq` frames (and every `inside_freq` iterations inside the
optimization; here we render once per tracked/mapped frame since the inner
loop is a single compiled program), render the full frame at the current
pose and save a 2x3 matplotlib panel: GT / rendered / residual for both
depth and color.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np

from nice_slam_tpu.core.cameras import Intrinsics
from nice_slam_tpu.render.renderer import (
    RenderConfig, SceneModel, render_image)


class Visualizer:
    def __init__(self, vis_dir: str, freq: int, *, model: SceneModel,
                 rcfg: RenderConfig, intr: Intrinsics, verbose: bool = False):
        self.vis_dir = vis_dir
        self.freq = max(int(freq), 1)
        # NSTPU_FUSED_MLP=1 opts into the fused Pallas decoder for the
        # full-frame renders (measured slower than XLA, see BASELINE.md)
        if model.kind == 'nice' and os.environ.get('NSTPU_FUSED_MLP') == '1':
            model = model._replace(fused_eval=True)
        self.model = model
        self.rcfg = rcfg
        self.intr = intr
        self.verbose = verbose
        os.makedirs(vis_dir, exist_ok=True)

    def vis(self, idx: int, iter_i: int, gt_depth: np.ndarray,
            gt_color: np.ndarray, c2w: np.ndarray, params: Any,
            grids: Any) -> str | None:
        if idx % self.freq != 0:
            return None
        import jax.numpy as jnp
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt

        depth, var, color = render_image(
            params, grids, jnp.asarray(c2w), self.intr, stage='color',
            model=self.model, rcfg=self.rcfg, gt_depth=jnp.asarray(gt_depth))
        depth = np.asarray(depth)
        color = np.clip(np.asarray(color), 0, 1)

        depth_res = np.abs(gt_depth - depth)
        depth_res[gt_depth == 0.0] = 0.0
        color_res = np.abs(gt_color - color)
        color_res[gt_depth == 0.0] = 0.0

        max_d = float(np.max(gt_depth)) or 1.0
        fig, axs = plt.subplots(2, 3, figsize=(12, 6))
        for ax in axs.ravel():
            ax.set_xticks([])
            ax.set_yticks([])
        axs[0, 0].imshow(gt_depth, cmap='plasma', vmin=0, vmax=max_d)
        axs[0, 0].set_title('input depth')
        axs[0, 1].imshow(depth, cmap='plasma', vmin=0, vmax=max_d)
        axs[0, 1].set_title('rendered depth')
        axs[0, 2].imshow(depth_res, cmap='plasma', vmin=0, vmax=max_d)
        axs[0, 2].set_title('depth residual')
        axs[1, 0].imshow(gt_color)
        axs[1, 0].set_title('input rgb')
        axs[1, 1].imshow(color)
        axs[1, 1].set_title('rendered rgb')
        axs[1, 2].imshow(np.clip(color_res, 0, 1))
        axs[1, 2].set_title('rgb residual')
        plt.subplots_adjust(wspace=0.02, hspace=0.1)
        out = os.path.join(self.vis_dir, f'{idx:05d}_{iter_i:04d}.jpg')
        fig.savefig(out, bbox_inches='tight', pad_inches=0.2, dpi=90)
        plt.close(fig)
        if self.verbose:
            print(f'INFO: saved rendering visualization to {out}')
        return out
