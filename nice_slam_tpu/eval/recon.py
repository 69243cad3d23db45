"""Reconstruction quality metrics (L7).

Functional parity target: /root/reference/src/tools/eval_recon.py.
  * 3D (:24-117): sample 200k points on each mesh surface; accuracy =
    mean NN distance rec->gt, completion = gt->rec, completion ratio =
    fraction of gt samples within 5 cm; optional ICP pre-alignment.
  * 2D (:131-210): depth-L1 over 1000 random in-room views, rejection-
    sampled so the view sees enough valid GT geometry.  The reference
    renders with Open3D's offscreen OpenGL; here depth comes from the
    first-party native rasterizer (mesh/native).

All distances reported in centimeters (x100) like the reference.
"""

from __future__ import annotations

import numpy as np

from nice_slam_tpu.mesh.native import rasterize_depth


def sample_surface(verts: np.ndarray, tris: np.ndarray, n: int,
                   rng: np.random.Generator) -> np.ndarray:
    """Uniform area-weighted surface sampling (trimesh.sample equivalent)."""
    a = verts[tris[:, 1]] - verts[tris[:, 0]]
    b = verts[tris[:, 2]] - verts[tris[:, 0]]
    area = 0.5 * np.linalg.norm(np.cross(a, b), axis=1)
    total = area.sum()
    if total <= 0:
        raise ValueError('mesh has no area')
    face = rng.choice(len(tris), size=n, p=area / total)
    r1 = np.sqrt(rng.random(n))
    r2 = rng.random(n)
    v0, v1, v2 = (verts[tris[face, 0]], verts[tris[face, 1]],
                  verts[tris[face, 2]])
    return (1 - r1)[:, None] * v0 + (r1 * (1 - r2))[:, None] * v1 \
        + (r1 * r2)[:, None] * v2


def nn_distances(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    from scipy.spatial import cKDTree
    tree = cKDTree(dst)
    d, _ = tree.query(src, k=1, workers=-1)
    return d


def icp_align(source_pts: np.ndarray, target_pts: np.ndarray,
              iters: int = 20, threshold: float = 0.1) -> np.ndarray:
    """Point-to-point ICP returning a 4x4 transform of source onto target
    (replaces Open3D registration_icp used at eval_recon.py:45-59)."""
    from scipy.spatial import cKDTree
    transform = np.eye(4)
    src = source_pts.copy()
    tree = cKDTree(target_pts)
    for _ in range(iters):
        d, idx = tree.query(src, k=1, workers=-1)
        m = d < threshold
        if m.sum() < 10:
            break
        p = src[m]
        q = target_pts[idx[m]]
        pm, qm = p.mean(0), q.mean(0)
        w = (p - pm).T @ (q - qm)
        u, _, vt = np.linalg.svd(w)
        s = np.eye(3)
        if np.linalg.det(u @ vt) < 0:
            s[2, 2] = -1
        rot = vt.T @ s @ u.T
        t = qm - rot @ pm
        step = np.eye(4)
        step[:3, :3] = rot
        step[:3, 3] = t
        src = src @ rot.T + t
        transform = step @ transform
    return transform


def calc_3d_metric(rec_verts, rec_tris, gt_verts, gt_tris, *,
                   align: bool = True, n_samples: int = 200000,
                   completion_thresh: float = 0.05, seed: int = 0) -> dict:
    """Accuracy / completion / completion-ratio in cm (eval_recon.py:24-117)."""
    rng = np.random.default_rng(seed)
    rec_pts = sample_surface(rec_verts, rec_tris, n_samples, rng)
    gt_pts = sample_surface(gt_verts, gt_tris, n_samples, rng)

    if align:
        transform = icp_align(rec_pts[::20], gt_pts[::20])
        rec_pts = rec_pts @ transform[:3, :3].T + transform[:3, 3]

    acc = nn_distances(rec_pts, gt_pts)
    comp = nn_distances(gt_pts, rec_pts)
    return {
        'accuracy_cm': float(acc.mean() * 100),
        'completion_cm': float(comp.mean() * 100),
        'completion_ratio_%': float((comp < completion_thresh).mean() * 100),
    }


def _random_inward_pose(bounds_lo, bounds_hi, rng) -> np.ndarray:
    """Random camera inside the scene AABB looking in a random direction
    (c2w, CV convention: +z forward)."""
    eye = rng.uniform(bounds_lo, bounds_hi)
    fwd = rng.normal(size=3)
    fwd /= np.linalg.norm(fwd)
    up = np.array([0.0, 1.0, 0.0])
    if abs(fwd @ up) > 0.95:
        up = np.array([1.0, 0.0, 0.0])
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    true_up = np.cross(fwd, right)
    c2w = np.eye(4)
    c2w[:3, 0] = right
    c2w[:3, 1] = true_up
    c2w[:3, 2] = fwd
    c2w[:3, 3] = eye
    return c2w


def calc_2d_metric(rec_verts, rec_tris, gt_verts, gt_tris, *,
                   n_imgs: int = 1000, seed: int = 0,
                   image_size: int = 500, focal: float = 300.0,
                   min_valid_ratio: float = 0.5) -> dict:
    """Depth-L1 over random in-room renders, cm (eval_recon.py:131-210).

    A sampled view is accepted only if the GT render covers at least
    `min_valid_ratio` of the image (the reference rejects views that stare
    at unobserved space via check_proj, :62-88).
    """
    rng = np.random.default_rng(seed)
    lo = gt_verts.min(axis=0)
    hi = gt_verts.max(axis=0)
    h = w = image_size
    cx = cy = image_size / 2.0 - 0.5

    errors = []
    attempts = 0
    while len(errors) < n_imgs and attempts < n_imgs * 20:
        attempts += 1
        c2w = _random_inward_pose(lo, hi, rng)
        w2c = np.linalg.inv(c2w)
        gt_d = rasterize_depth(gt_verts, gt_tris, w2c, focal, focal,
                               cx, cy, h, w)
        valid = gt_d > 0
        if valid.mean() < min_valid_ratio:
            continue
        rec_d = rasterize_depth(rec_verts, rec_tris, w2c, focal, focal,
                                cx, cy, h, w)
        both = valid & (rec_d > 0)
        if both.sum() == 0:
            continue
        errors.append(np.abs(gt_d[both] - rec_d[both]).mean())
    return {
        'depth_l1_cm': float(np.mean(errors) * 100) if errors else np.nan,
        'n_views': len(errors),
    }
