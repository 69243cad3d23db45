"""Differential ingest tests: OUR loaders vs the REFERENCE'S OWN loader
classes (/root/reference/src/utils/datasets.py:47-344), instantiated on the
same on-disk fixture trees.

This is the strongest offline proof the ingest layer behaves on real data:
the reference classes are the executable spec for frame enumeration,
timestamp association, pose conventions (y/z flip, TUM rebase), pixel
preprocessing (BGR->RGB /255, png_depth_scale, undistort, crop_size
F.interpolate semantics, crop_edge), and our loaders must reproduce them
bit-for-bit (float32 tolerance).

CoFusion's EXR read in the reference needs the OpenEXR package (absent
here); the reference module's `readEXR_onlydepth` is monkeypatched with our
first-party codec, so the differential covers everything EXCEPT the codec
itself (covered by tests/test_dataset_fixtures.test_exr_codec_roundtrip).

Skipped automatically when /root/reference is not present.
"""

import os
import sys
from types import SimpleNamespace

import numpy as np
import pytest

REF = '/root/reference'
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, 'tools'))

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, 'src')),
    reason='reference checkout not available')

if os.path.isdir(os.path.join(REF, 'src')):
    sys.path.insert(0, REF)

# the reference's TUM parse_list uses np.unicode_ (datasets.py:258-260),
# removed in NumPy 2.0 — restore the alias so the reference class runs
# unmodified in this environment
if not hasattr(np, 'unicode_'):
    np.unicode_ = np.str_

from make_fixture_dataset import DEPTH_SCALE, make_frames, write_dataset  # noqa: E402
from nice_slam_tpu.io.datasets import get_dataset  # noqa: E402

H, W = 48, 64
FX = FY = 0.5 * W
CX, CY = 0.5 * W - 0.5, 0.5 * H - 0.5
N = 6
KINDS = ['replica', 'scannet', 'azure', 'tumrgbd', 'cofusion']


@pytest.fixture(scope='module')
def frames():
    return make_frames(N, H, W, FX, FY, CX, CY)


@pytest.fixture(scope='module')
def trees(frames, tmp_path_factory):
    out = {}
    for kind in KINDS:
        folder = str(tmp_path_factory.mktemp(f'diff_{kind}'))
        write_dataset(kind, folder, frames, H, W, FX, FY, CX, CY)
        out[kind] = folder
    return out


def _cam(extra=None):
    cam = {'H': H, 'W': W, 'fx': FX, 'fy': FY, 'cx': CX, 'cy': CY,
           'crop_edge': 0}
    if extra:
        cam.update(extra)
    return cam


def _ref_dataset(kind, folder, cam_extra=None):
    import src.utils.datasets as ref_ds

    if kind == 'cofusion':
        # the reference reads EXR via the OpenEXR package (datasets.py:12-44),
        # absent here; substitute the first-party codec (same 'Y' contract)
        from nice_slam_tpu.io.exr import read_exr_depth
        ref_ds.readEXR_onlydepth = read_exr_depth
    cfg = {'dataset': kind,
           'cam': dict(_cam(cam_extra),
                       png_depth_scale=DEPTH_SCALE[kind]),
           'data': {'input_folder': folder}}
    args = SimpleNamespace(input_folder=None)
    return ref_ds.get_dataset(cfg, args, scale=1.0, device='cpu')


def _our_dataset(kind, folder, cam_extra=None):
    cfg = {'dataset': kind, 'scale': 1.0,
           'cam': dict(_cam(cam_extra),
                       png_depth_scale=DEPTH_SCALE[kind]),
           'data': {'input_folder': folder}}
    return get_dataset(cfg)


def _assert_frames_equal(ref, ours, n_check=None):
    assert len(ref) == len(ours)
    # identical frame enumeration (paths chosen, association, ordering)
    assert [os.path.basename(p) for p in ref.color_paths] == \
           [os.path.basename(p) for p in ours.color_paths]
    assert [os.path.basename(p) for p in ref.depth_paths] == \
           [os.path.basename(p) for p in ours.depth_paths]
    idxs = range(len(ref)) if n_check is None else \
        sorted({0, len(ref) // 2, len(ref) - 1})
    for i in idxs:
        r_idx, r_color, r_depth, r_pose = ref[i]
        o_idx, o_color, o_depth, o_pose = ours[i]
        assert r_idx == o_idx == i
        np.testing.assert_allclose(
            o_color, r_color.numpy().astype(np.float32), atol=2e-6,
            err_msg=f'color frame {i}')
        np.testing.assert_allclose(
            o_depth, r_depth.numpy().astype(np.float32), atol=1e-6,
            err_msg=f'depth frame {i}')
        np.testing.assert_allclose(
            o_pose, r_pose.numpy().astype(np.float32), atol=1e-6,
            err_msg=f'pose frame {i}')


@pytest.mark.parametrize('kind', KINDS)
def test_loader_matches_reference(kind, trees):
    """Every loader must be bit-identical (f32) to the reference class on
    the same fixture tree: frame lists, poses, color/depth tensors."""
    ref = _ref_dataset(kind, trees[kind])
    ours = _our_dataset(kind, trees[kind])
    _assert_frames_equal(ref, ours)


def test_crop_edge_matches_reference(trees):
    """crop_edge shrinks the images identically (datasets.py:106-110)."""
    ref = _ref_dataset('replica', trees['replica'], {'crop_edge': 4})
    ours = _our_dataset('replica', trees['replica'], {'crop_edge': 4})
    r = ref[1]
    o = ours[1]
    assert o[1].shape == (H - 8, W - 8, 3)
    np.testing.assert_allclose(o[1], r[1].numpy().astype(np.float32),
                               atol=2e-6)
    np.testing.assert_allclose(o[2], r[2].numpy().astype(np.float32),
                               atol=1e-6)


def test_crop_size_matches_reference(trees):
    """crop_size resize must reproduce torch F.interpolate semantics:
    bilinear align_corners=True on color, 'nearest' on depth
    (datasets.py:97-104) — the TUM configs all use crop_size [384,512]."""
    cam = {'crop_size': [H - 14, W - 10]}
    ref = _ref_dataset('replica', trees['replica'], cam)
    ours = _our_dataset('replica', trees['replica'], cam)
    for i in (0, N - 1):
        r = ref[i]
        o = ours[i]
        assert o[1].shape == (H - 14, W - 10, 3)
        assert o[2].shape == (H - 14, W - 10)
        np.testing.assert_allclose(o[1], r[1].numpy().astype(np.float32),
                                   atol=2e-6)
        # nearest-resized depth must be EXACT (same source pixels chosen)
        np.testing.assert_array_equal(o[2], r[2].numpy().astype(np.float32))


def test_distortion_matches_reference(trees):
    """Undistortion applies to color only, via the same intrinsics matrix
    (datasets.py:85-88); TUM fr1/fr2 configs carry distortion."""
    cam = {'distortion': [0.2624, -0.9531, -0.0054, 0.0026, 1.1633]}
    ref = _ref_dataset('replica', trees['replica'], cam)
    ours = _our_dataset('replica', trees['replica'], cam)
    r = ref[2]
    o = ours[2]
    np.testing.assert_allclose(o[1], r[1].numpy().astype(np.float32),
                               atol=2e-6)
    np.testing.assert_allclose(o[2], r[2].numpy().astype(np.float32),
                               atol=1e-6)


def test_tum_crop_pipeline_matches_reference(trees):
    """The full TUM per-scene preprocessing stack (association + rebase +
    crop_size + crop_edge) end-to-end vs the reference class."""
    cam = {'crop_size': [40, 56], 'crop_edge': 2}
    ref = _ref_dataset('tumrgbd', trees['tumrgbd'], cam)
    ours = _our_dataset('tumrgbd', trees['tumrgbd'], cam)
    _assert_frames_equal(ref, ours)
