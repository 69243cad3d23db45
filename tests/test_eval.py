"""Eval tools: Horn alignment, ATE stats, 3D/2D reconstruction metrics."""

import numpy as np

from nice_slam_tpu.eval.ate import align_horn, associate, evaluate_ate
from nice_slam_tpu.eval.recon import calc_2d_metric, calc_3d_metric


def _traj(n, rng):
    t = np.cumsum(rng.normal(scale=0.05, size=(n, 3)), axis=0)
    poses = np.tile(np.eye(4), (n, 1, 1))
    poses[:, :3, 3] = t
    return poses


def test_horn_alignment_exact():
    rng = np.random.default_rng(0)
    gt = rng.normal(size=(3, 50))
    ang = 0.7
    rot = np.array([[np.cos(ang), -np.sin(ang), 0],
                    [np.sin(ang), np.cos(ang), 0], [0, 0, 1.0]])
    est = rot.T @ (gt - np.array([[1.0], [2.0], [3.0]]))
    _, _, err = align_horn(est, gt)
    assert err.max() < 1e-9


def test_evaluate_ate_known_error():
    rng = np.random.default_rng(1)
    gt = _traj(40, rng)
    est = gt.copy()
    est[:, :3, 3] += rng.normal(scale=0.01, size=(40, 3))
    stats = evaluate_ate(est, gt)
    assert stats['compared_pose_pairs'] == 40
    rmse = stats['absolute_translational_error.rmse']
    assert 0.003 < rmse < 0.02


def test_evaluate_ate_masks_invalid_gt():
    rng = np.random.default_rng(2)
    gt = _traj(20, rng)
    gt[5] = np.nan
    est = gt.copy()
    stats = evaluate_ate(est, gt)
    assert stats['compared_pose_pairs'] == 19


def test_associate():
    a = {0.0: 1, 1.0: 2, 2.0: 3}
    b = {0.01: 'x', 1.015: 'y', 5.0: 'z'}
    m = associate(a, b)
    assert m == [(0.0, 0.01), (1.0, 1.015)]


def _box_mesh(size=1.0, offset=0.0):
    """Axis-aligned cube shell mesh."""
    from nice_slam_tpu.mesh.native import marching_tetrahedra
    n = 32
    xs = np.linspace(-1.5, 1.5, n)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing='ij')
    field = (size / 2 - np.maximum.reduce(
        [np.abs(X - offset), np.abs(Y), np.abs(Z)])).astype(np.float32)
    return marching_tetrahedra(field, xs, xs, xs, 0.0)


def test_3d_metric_identical_meshes():
    v, t = _box_mesh()
    m = calc_3d_metric(v, t, v, t, align=False, n_samples=20000)
    assert m['accuracy_cm'] < 1.0
    assert m['completion_cm'] < 1.0
    assert m['completion_ratio_%'] > 99.0


def test_3d_metric_icp_fixes_offset():
    v, t = _box_mesh()
    v2, t2 = _box_mesh(offset=0.04)
    m_no = calc_3d_metric(v2, t2, v, t, align=False, n_samples=20000)
    m_icp = calc_3d_metric(v2, t2, v, t, align=True, n_samples=20000)
    assert m_icp['accuracy_cm'] < m_no['accuracy_cm']
    assert m_icp['accuracy_cm'] < 2.0


def test_2d_metric_runs():
    v, t = _box_mesh()
    m = calc_2d_metric(v, t, v, t, n_imgs=5, image_size=100, focal=60.0,
                       min_valid_ratio=0.3)
    assert m['n_views'] == 5
    assert m['depth_l1_cm'] < 0.5
