"""Absolute trajectory error (ATE) evaluation (L7).

Functional parity target: /root/reference/src/tools/eval_ate.py (itself the
standard TUM RGB-D benchmark script):
  * Horn's closed-form SVD alignment of the estimated trajectory onto the
    ground truth (:44-78);
  * translational RMSE / mean / median / std / min / max over aligned pairs
    (:165-223);
  * invalid (nan/inf) ground-truth poses masked out (ScanNet, :239-256).
"""

from __future__ import annotations

import numpy as np


def align_horn(model: np.ndarray, data: np.ndarray):
    """Align two trajectories by a rigid transform (closed form, Horn 1987).

    Args:
      model: [3, N] estimated positions.
      data:  [3, N] ground-truth positions.
    Returns:
      (rot [3,3], trans [3,1], trans_error [N]) with model aligned onto data.
    """
    model_mean = model.mean(axis=1, keepdims=True)
    data_mean = data.mean(axis=1, keepdims=True)
    model_zc = model - model_mean
    data_zc = data - data_mean

    w = model_zc @ data_zc.T
    u, _, vt = np.linalg.svd(w.T)
    s = np.eye(3)
    if np.linalg.det(u) * np.linalg.det(vt) < 0:
        s[2, 2] = -1
    rot = u @ s @ vt
    trans = data_mean - rot @ model_mean

    aligned = rot @ model + trans
    err = aligned - data
    trans_error = np.sqrt(np.sum(err * err, axis=0))
    return rot, trans, trans_error


def evaluate_ate(est_c2w: np.ndarray, gt_c2w: np.ndarray,
                 *, scale: float = 1.0) -> dict:
    """ATE statistics over a pose list [N, 4, 4] pair.

    Poses whose ground truth contains nan/inf are dropped (eval_ate.py
    convert_poses, :239-256).  Translations are divided by `scale` so
    results are metric when the pipeline ran with a global scale.
    """
    n = min(len(est_c2w), len(gt_c2w))
    est = est_c2w[:n].astype(np.float64)
    gt = gt_c2w[:n].astype(np.float64)
    valid = np.isfinite(gt.reshape(n, -1)).all(axis=1) \
        & (np.abs(gt.reshape(n, -1)) < 1e6).all(axis=1) \
        & np.isfinite(est.reshape(n, -1)).all(axis=1)
    est_t = est[valid][:, :3, 3].T / scale
    gt_t = gt[valid][:, :3, 3].T / scale

    _, _, trans_error = align_horn(est_t, gt_t)
    return {
        'compared_pose_pairs': int(valid.sum()),
        'absolute_translational_error.rmse':
            float(np.sqrt(np.mean(trans_error ** 2))),
        'absolute_translational_error.mean': float(np.mean(trans_error)),
        'absolute_translational_error.median': float(np.median(trans_error)),
        'absolute_translational_error.std': float(np.std(trans_error)),
        'absolute_translational_error.min': float(np.min(trans_error)),
        'absolute_translational_error.max': float(np.max(trans_error)),
    }


def associate(first: dict, second: dict, offset: float = 0.0,
              max_difference: float = 0.02) -> list:
    """Timestamp association between two stamped pose dicts
    (eval_ate.py:11-41) — used for TUM-format trajectory files."""
    first_keys = list(first.keys())
    second_keys = list(second.keys())
    potential = [(abs(a - (b + offset)), a, b)
                 for a in first_keys for b in second_keys
                 if abs(a - (b + offset)) < max_difference]
    potential.sort()
    matches = []
    used_a, used_b = set(), set()
    for _, a, b in potential:
        if a not in used_a and b not in used_b:
            used_a.add(a)
            used_b.add(b)
            matches.append((a, b))
    matches.sort()
    return matches
