"""Differentials for the auxiliary reference math: the ATE evaluator and
the frustum feature-selection mask, each run against the REFERENCE'S OWN
implementation on identical inputs.

Complements tests/test_reference_parity.py (decoders/renderer) and
tests/test_reference_loader_diff.py (ingest).  Skipped when
/root/reference is not present.
"""

import os
import sys
from types import SimpleNamespace

import numpy as np
import pytest

REF = '/root/reference'
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, 'src')),
    reason='reference checkout not available')

if os.path.isdir(os.path.join(REF, 'src')):
    sys.path.insert(0, REF)


def _traj(n, rng, noise=0.01):
    gt = np.cumsum(rng.normal(scale=0.05, size=(n, 3)), axis=0)
    est = gt + rng.normal(scale=noise, size=(n, 3))
    # apply a rigid transform to the estimate — Horn alignment must undo it
    ang = 0.4
    rot = np.array([[np.cos(ang), -np.sin(ang), 0],
                    [np.sin(ang), np.cos(ang), 0], [0, 0, 1.0]])
    est = est @ rot.T + np.array([0.7, -0.3, 1.1])
    return gt, est


def test_evaluate_ate_matches_reference():
    """Our ATE stats must equal the reference's evaluate_ate (the
    TUM-benchmark Horn alignment + error stats,
    /root/reference/src/tools/eval_ate.py:44-228) on the same
    trajectories."""
    from src.tools.eval_ate import evaluate_ate as ref_evaluate_ate
    from nice_slam_tpu.eval.ate import evaluate_ate

    rng = np.random.default_rng(0)
    gt, est = _traj(50, rng)

    ref = ref_evaluate_ate({i: gt[i] for i in range(50)},
                           {i: est[i] for i in range(50)}, plot='')

    gt_p = np.tile(np.eye(4), (50, 1, 1))
    est_p = np.tile(np.eye(4), (50, 1, 1))
    gt_p[:, :3, 3] = gt
    est_p[:, :3, 3] = est
    ours = evaluate_ate(est_p, gt_p)

    assert ours['compared_pose_pairs'] == ref['compared_pose_pairs'] == 50
    for k in ('rmse', 'mean', 'median', 'std', 'min', 'max'):
        key = f'absolute_translational_error.{k}'
        np.testing.assert_allclose(ours[key], float(ref[key]), rtol=1e-9,
                                   err_msg=key)


def test_evaluate_ate_invalid_gt_matches_reference():
    """ScanNet nan-GT masking: our evaluator masks internally; the
    reference drops those frames in convert_poses (eval_ate.py:239-256) —
    the surviving comparison must be identical."""
    from src.tools.eval_ate import evaluate_ate as ref_evaluate_ate
    from nice_slam_tpu.eval.ate import evaluate_ate

    rng = np.random.default_rng(1)
    gt, est = _traj(30, rng)
    bad = [4, 17]

    ref_first = {i: gt[i] for i in range(30) if i not in bad}
    ref_second = {i: est[i] for i in range(30) if i not in bad}
    ref = ref_evaluate_ate(ref_first, ref_second, plot='')

    gt_p = np.tile(np.eye(4), (30, 1, 1))
    est_p = np.tile(np.eye(4), (30, 1, 1))
    gt_p[:, :3, 3] = gt
    est_p[:, :3, 3] = est
    for b in bad:
        gt_p[b] = np.nan
    ours = evaluate_ate(est_p, gt_p)

    assert ours['compared_pose_pairs'] == ref['compared_pose_pairs'] == 28
    np.testing.assert_allclose(
        ours['absolute_translational_error.rmse'],
        float(ref['absolute_translational_error.rmse']), rtol=1e-9)


def test_frustum_mask_matches_reference():
    """Frustum feature selection vs the reference's get_mask_from_c2w
    (cv2.remap depth test + near-camera ball, Mapper.py:100-187) on the
    same grid lattice, pose and depth image."""
    import jax.numpy as jnp
    import torch
    from src.Mapper import Mapper
    from nice_slam_tpu.core.cameras import Intrinsics
    from nice_slam_tpu.engine.frustum import frustum_mask
    from nice_slam_tpu.models.grids import GridConfig, grid_world_coords

    h, w = 48, 64
    intr = Intrinsics(H=h, W=w, fx=32.0, fy=32.0, cx=31.5, cy=23.5)
    gcfg = GridConfig(bound=((-1.28, 1.28), (-0.96, 0.96), (-1.28, 1.28)))

    rng = np.random.default_rng(2)
    depth_np = (0.5 + rng.random((h, w)) * 1.5).astype(np.float32)
    depth_np[10:14, 20:30] = 0.0     # invalid-depth region -> max fill
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [0.1, -0.05, 0.2]
    ang = 0.3
    c2w[:3, :3] = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                            [-np.sin(ang), 0, np.cos(ang)]],
                           dtype=np.float32)

    fake = SimpleNamespace(H=h, W=w, fx=intr.fx, fy=intr.fy, cx=intr.cx,
                           cy=intr.cy,
                           bound=torch.tensor(np.asarray(gcfg.bound_np)))
    for name in ('middle', 'fine'):
        pts = grid_world_coords(gcfg, name)
        nx, ny, nz = pts.shape[:3]
        # reference grids are [1, C, Nz, Ny, Nx]; val_shape = (Nz, Ny, Nx)
        ref_mask = Mapper.get_mask_from_c2w(
            fake, torch.tensor(c2w), f'grid_{name}', (nz, ny, nx),
            depth_np)
        ref_flat = np.asarray(ref_mask).reshape(-1)

        ours = np.asarray(frustum_mask(
            jnp.asarray(pts.reshape(-1, 3)), jnp.asarray(c2w),
            jnp.asarray(depth_np), intr)) > 0.5

        # float borderline cases (uv exactly on an edge, depth+0.5 ties)
        # may flip between the two float pipelines; everything else must
        # agree exactly
        agree = np.mean(ours == ref_flat)
        assert agree > 0.995, (name, agree, ours.sum(), ref_flat.sum())
        # and the selection is non-trivial (sees part of the grid)
        assert 0.05 < ours.mean() < 0.95, ours.mean()


def test_keyframe_overlap_selection_matches_reference():
    """Keyframe co-visibility selection vs the reference's
    keyframe_selection_overlap (Mapper.py:189-293) with the SAME sparse
    pixel draw injected into both sides.

    Note the reference's semantics: rank by percent-inside, filter > 0,
    then take a uniformly random k of the NONZERO set (the permutation
    runs over the whole filtered list) — so the comparable invariant is
    the nonzero candidate SET, which must match exactly.  Our
    select_overlap reproduces those semantics with its np.random
    Generator."""
    import torch
    import src.Mapper as ref_mapper
    from src.common import get_rays_from_uv
    from nice_slam_tpu.core.cameras import Intrinsics
    from nice_slam_tpu.engine.keyframes import Keyframe, KeyframeStore

    h, w = 48, 64
    intr = Intrinsics(H=h, W=w, fx=32.0, fy=32.0, cx=31.5, cy=23.5)
    rng_master = np.random.default_rng(7)
    depth_np = (0.6 + rng_master.random((h, w)) * 1.2).astype(np.float32)
    color_np = rng_master.random((h, w, 3)).astype(np.float32)

    def pose(tx, ang):
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                              [-np.sin(ang), 0, np.cos(ang)]], np.float32)
        m[:3, 3] = [tx, 0.0, 0.0]
        return m

    # keyframes spread from strongly-overlapping to facing away
    kf_poses = [pose(0.05 * i, 0.25 * i) for i in range(8)]
    kf_poses.append(pose(0.0, np.pi))          # behind: zero overlap
    cur_c2w = pose(0.02, 0.1)

    # OUR side: a seeded generator; its pixel draw is reproducible
    seed = 1234
    store = KeyframeStore()
    for i, p in enumerate(kf_poses):
        store.append(Keyframe(idx=i, color=color_np, depth=depth_np,
                              est_c2w=p, gt_c2w=p))
    store.append(Keyframe(idx=99, color=color_np, depth=depth_np,
                          est_c2w=cur_c2w, gt_c2w=cur_c2w))  # newest: excluded
    ours = store.select_overlap(np.random.default_rng(seed), k=100,
                                gt_depth=depth_np, c2w=cur_c2w, intr=intr)

    # REFERENCE side: stub get_samples to draw the SAME pixels
    flat = np.random.default_rng(seed).integers(0, h * w, size=100)
    jj = torch.tensor((flat // w).astype(np.float32))
    ii = torch.tensor((flat % w).astype(np.float32))

    def stub_get_samples(H0, H1, W0, W1, n, H, W, fx, fy, cx, cy, c2w,
                         depth, color, device):
        rays_o, rays_d = get_rays_from_uv(ii, jj, c2w, H, W, fx, fy, cx,
                                          cy, device)
        return (rays_o, rays_d, depth[jj.long(), ii.long()],
                color[jj.long(), ii.long()])

    orig = ref_mapper.get_samples
    ref_mapper.get_samples = stub_get_samples
    try:
        fake = SimpleNamespace(device='cpu', H=h, W=w, fx=intr.fx,
                               fy=intr.fy, cx=intr.cx, cy=intr.cy)
        kf_dict = [{'est_c2w': torch.tensor(p)} for p in kf_poses]
        ref = ref_mapper.Mapper.keyframe_selection_overlap(
            fake, torch.tensor(color_np), torch.tensor(depth_np),
            torch.tensor(cur_c2w), kf_dict, k=100)
    finally:
        ref_mapper.get_samples = orig

    assert set(int(i) for i in ours) == set(int(i) for i in ref), \
        (sorted(ours), sorted(int(i) for i in ref))
    # the facing-away keyframe must be excluded, the near-identical ones in
    assert 8 not in set(int(i) for i in ours)
    assert 0 in set(int(i) for i in ours)
