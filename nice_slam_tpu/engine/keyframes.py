"""Keyframe store and selection policies (L3).

Functional parity targets:
  * keyframe append cadence:  Mapper.run (:753-758) — every `keyframe_every`
    mapped frame plus the second-to-last frame of the sequence.
  * 'global' random selection: common.random_select (:66-71) — a random
    permutation of all but the newest keyframe.
  * 'overlap' selection: Mapper.keyframe_selection_overlap (:189-293) —
    sample 100 pixels x 16 depths in [0.8 d, d + 0.5] from the current
    frame, project the point cloud into each candidate keyframe, rank by
    the fraction landing inside the (20px-margined) image in front of the
    camera, then randomly pick k among those with nonzero overlap.

Both policies run on the host in numpy: selection is a few-thousand-point
projection done once per mapped frame — far off the hot path.  Keyframe
images live in host memory (the reference keeps them on the CPU too,
Mapper.py:757) and the mapping window is stacked and shipped to the device
per mapping call.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from nice_slam_tpu.core.cameras import Intrinsics


@dataclass
class Keyframe:
    idx: int
    color: np.ndarray      # [H, W, 3] float32
    depth: np.ndarray      # [H, W] float32
    est_c2w: np.ndarray    # [4, 4]
    gt_c2w: np.ndarray     # [4, 4]


@dataclass
class KeyframeStore:
    frames: list[Keyframe] = field(default_factory=list)

    def __len__(self) -> int:
        return len(self.frames)

    def append(self, kf: Keyframe) -> None:
        self.frames.append(kf)

    @property
    def indices(self) -> list[int]:
        return [kf.idx for kf in self.frames]

    def select_global(self, rng: np.random.Generator, k: int) -> list[int]:
        """Random keyframes among all but the newest (Mapper.py:324-326)."""
        n = len(self.frames) - 1
        if n <= 0:
            return []
        return list(rng.permutation(n)[:min(n, k)])

    def select_overlap(self, rng: np.random.Generator, k: int,
                       gt_depth: np.ndarray, c2w: np.ndarray,
                       intr: Intrinsics, *, n_pixels: int = 100,
                       n_samples: int = 16) -> list[int]:
        """Co-visibility ranked selection (Mapper.py:189-293).

        Candidates are all keyframes except the newest (the caller window
        always includes that one).
        """
        candidates = self.frames[:-1]
        if not candidates:
            return []
        h, w = gt_depth.shape
        flat = rng.integers(0, h * w, size=n_pixels)
        jj = (flat // w).astype(np.float64)
        ii = (flat % w).astype(np.float64)
        d = gt_depth[jj.astype(int), ii.astype(int)].astype(np.float64)

        dirs = np.stack([(ii - intr.cx) / intr.fx, -(jj - intr.cy) / intr.fy,
                         -np.ones_like(ii)], axis=-1)
        rays_d = dirs @ c2w[:3, :3].T
        rays_o = c2w[:3, 3]

        t_vals = np.linspace(0.0, 1.0, n_samples)
        near = (d * 0.8)[:, None]
        far = (d + 0.5)[:, None]
        z = near * (1 - t_vals) + far * t_vals          # [P, S]
        pts = rays_o + rays_d[:, None, :] * z[..., None]
        pts = pts.reshape(-1, 3)
        pts_h = np.concatenate([pts, np.ones_like(pts[:, :1])], axis=1)

        percents = []
        for kf in candidates:
            w2c = np.linalg.inv(kf.est_c2w)
            cam = (pts_h @ w2c.T)[:, :3]
            zc = cam[:, 2] + 1e-5
            u = (intr.fx * (-cam[:, 0]) + intr.cx * zc) / zc
            v = (intr.fy * cam[:, 1] + intr.cy * zc) / zc
            edge = 20
            inside = ((u < w - edge) & (u > edge)
                      & (v < h - edge) & (v > edge) & (zc < 0))
            percents.append(inside.mean())

        order = np.argsort(-np.asarray(percents), kind='stable')
        nonzero = [int(i) for i in order if percents[i] > 0.0]
        return list(rng.permutation(nonzero)[:k])
