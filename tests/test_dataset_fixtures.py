"""Real-format dataset ingest: every loader reads an on-disk sequence in
its dataset's exact file format (written by tools/make_fixture_dataset.py)
and must reproduce the source imagery and trajectory.

This exercises the paths no in-memory test touches: image codecs (lossy
JPEG color, uint16 PNG depth at png_depth_scale, EXR), traj.txt / pose-dir
/ trajectory.log parsing, ScanNet invalid-pose frames, and TUM timestamp
association + first-pose rebase.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'tools'))

from make_fixture_dataset import (  # noqa: E402
    DEPTH_SCALE, make_frames, write_config, write_dataset)
from nice_slam_tpu.io.datasets import get_dataset  # noqa: E402

H, W = 60, 80
FX = FY = 0.5 * W
CX, CY = 0.5 * W - 0.5, 0.5 * H - 0.5
N = 6


@pytest.fixture(scope='module')
def frames():
    return make_frames(N, H, W, FX, FY, CX, CY)


def _cfg(kind, folder):
    return {'dataset': kind, 'scale': 1.0,
            'cam': {'H': H, 'W': W, 'fx': FX, 'fy': FY, 'cx': CX, 'cy': CY,
                    'png_depth_scale': DEPTH_SCALE[kind], 'crop_edge': 0},
            'data': {'input_folder': folder}}


def _check_images(ds, frames, *, lossy):
    for i in (0, N - 1):
        _, color, depth, _ = ds[i]
        src_color, src_depth, _ = frames[i]
        assert color.shape == (H, W, 3) and depth.shape == (H, W)
        atol = 0.08 if lossy else 0.01
        assert np.mean(np.abs(color - src_color)) < atol / 4
        assert np.max(np.abs(depth - src_depth)) < 2.0 / DEPTH_SCALE[
            ds.name] + 1e-4


def _relative_motions(poses):
    """Pairwise translation distances — invariant to any rigid transform of
    the whole trajectory, so they must match the source exactly."""
    t = np.stack([p[:3, 3] for p in poses])
    return np.linalg.norm(t[None] - t[:, None], axis=-1)


@pytest.mark.parametrize('kind', ['replica', 'scannet', 'azure'])
def test_matrix_pose_formats(kind, frames, tmp_path_factory):
    folder = str(tmp_path_factory.mktemp(kind))
    write_dataset(kind, folder, frames, H, W, FX, FY, CX, CY)
    ds = get_dataset(_cfg(kind, folder))
    assert len(ds) == N
    _check_images(ds, frames, lossy=True)
    # these loaders must reproduce the ORIGINAL OpenGL-convention poses
    for i in range(N):
        got = ds[i][3]
        np.testing.assert_allclose(got, frames[i][2].astype(np.float32),
                                   atol=1e-6)


def test_scannet_invalid_pose_frames(frames, tmp_path):
    folder = str(tmp_path)
    write_dataset('scannet', folder, frames, H, W, FX, FY, CX, CY,
                  scannet_nan_frame=3)
    ds = get_dataset(_cfg('scannet', folder))
    assert len(ds) == N
    assert not np.isfinite(ds[3][3]).all()   # surfaced, not crashed
    assert np.isfinite(ds[2][3]).all()
    # and the ATE eval masks it (reference convert_poses, eval_ate.py:247)
    from nice_slam_tpu.eval.ate import evaluate_ate
    gt = np.stack([ds[i][3] for i in range(N)])
    est = np.stack([frames[i][2] for i in range(N)]).astype(np.float32)
    res = evaluate_ate(est, gt)
    assert res['compared_pose_pairs'] == N - 1
    rmse = res['absolute_translational_error.rmse']
    assert np.isfinite(rmse) and rmse < 1e-3


def test_tum_association_and_rebase(frames, tmp_path):
    folder = str(tmp_path)
    write_dataset('tumrgbd', folder, frames, H, W, FX, FY, CX, CY)
    ds = get_dataset(_cfg('tumrgbd', folder))
    assert len(ds) == N            # all frames associated, none dropped
    _check_images(ds, frames, lossy=True)
    poses = [ds[i][3] for i in range(N)]
    # first pose rebased to the OpenGL flip of identity
    d = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)
    np.testing.assert_allclose(poses[0], d @ np.eye(4, dtype=np.float32),
                               atol=1e-5)
    # trajectory is a rigid transform of the source
    np.testing.assert_allclose(
        _relative_motions(poses),
        _relative_motions([f[2] for f in frames]), atol=1e-4)


def test_cofusion_exr_depth(frames, tmp_path):
    folder = str(tmp_path)
    write_dataset('cofusion', folder, frames, H, W, FX, FY, CX, CY)
    ds = get_dataset(_cfg('cofusion', folder))
    assert len(ds) == N
    _, color, depth, pose = ds[0]
    np.testing.assert_allclose(depth, frames[0][1], atol=1e-5)
    np.testing.assert_allclose(pose, np.eye(4), atol=0)


def test_exr_codec_roundtrip(tmp_path):
    """First-party EXR codec: ZIP/ZIPS/NONE float32 round-trips exactly;
    HALF reads; channel selection follows the reference's 'Y' contract."""
    from nice_slam_tpu.io.exr import read_exr, read_exr_depth, write_exr
    rng = np.random.default_rng(0)
    img = (rng.random((37, 53)) * 8).astype(np.float32)
    for comp in ('zip', 'zips', 'none'):
        p = str(tmp_path / f'{comp}.exr')
        write_exr(p, {'Y': img, 'A': img * 2}, compression=comp)
        got = read_exr(p)
        np.testing.assert_array_equal(got['Y'], img)
        np.testing.assert_array_equal(got['A'], img * 2)
        np.testing.assert_array_equal(read_exr_depth(p), img)
    # incompressible data exercises the stored-raw chunk branch
    noise = rng.random((16, 16)).astype(np.float32)
    p = str(tmp_path / 'raw.exr')
    write_exr(p, {'Y': noise}, compression='zip')
    np.testing.assert_array_equal(read_exr_depth(p), noise)
    # HALF pixel type
    p = str(tmp_path / 'half.exr')
    write_exr(p, {'Y': img}, compression='zip', half=True)
    np.testing.assert_array_equal(read_exr_depth(p),
                                  img.astype(np.float16).astype(np.float32))


def test_end_to_end_from_disk_replica_format(frames, tmp_path):
    """Full SLAM session (run.py code path: load_config -> SlamSystem ->
    step loop) on a disk-resident Replica-format sequence through the real
    loader; poses must track."""
    import yaml
    folder = str(tmp_path)
    write_dataset('replica', folder, frames, H, W, FX, FY, CX, CY)
    cfg_path = write_config('replica', folder, frames, H, W, FX, FY, CX, CY)
    from nice_slam_tpu.utils.config import load_config
    cfg = load_config(cfg_path)
    # shrink budgets for CPU CI
    # CI-scale budgets: lr_first_factor 5 (Replica's value) overshoots at
    # 400-pixel/400-iter bootstrap scale — factor 2 is stable here
    cfg['mapping'].update(iters_first=400, iters=30, every_frame=3,
                          keyframe_every=3, mapping_window_size=3,
                          pixels=400, lr_first_factor=2)
    cfg['tracking'].update(iters=20, pixels=200)
    cfg['rendering'].update(N_samples=16, N_surface=8)
    cfg['meshing']['resolution'] = 64
    cfg['verbose'] = False
    from nice_slam_tpu.engine.slam import SlamSystem
    slam = SlamSystem(cfg, nice=True, output=str(tmp_path / 'out'))
    slam.run()
    t_err = np.linalg.norm(
        slam.estimate_c2w[:, :3, 3] - slam.gt_c2w[:, :3, 3], axis=-1)
    assert np.max(t_err) < 0.04, t_err
    assert t_err[-1] < 0.03, t_err    # bounded, not linearly growing
