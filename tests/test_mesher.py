"""Mesher: field -> iso-surface on the synthetic scene + PLY round trip."""

import numpy as np
import pytest

from tests.util import make_test_cfg


def test_native_marching_tetrahedra_sphere():
    from nice_slam_tpu.mesh.native import marching_tetrahedra
    n = 40
    xs = np.linspace(-1, 1, n); ys = xs.copy(); zs = xs.copy()
    X, Y, Z = np.meshgrid(xs, ys, zs, indexing='ij')
    field = (0.6 - np.sqrt(X**2 + Y**2 + Z**2)).astype(np.float32)
    verts, tris = marching_tetrahedra(field, xs, ys, zs, 0.0)
    r = np.linalg.norm(verts, axis=1)
    assert len(verts) > 1000
    np.testing.assert_allclose(r.mean(), 0.6, atol=0.005)
    assert r.std() < 0.005
    # watertight-ish: every face references valid shared vertices
    assert tris.max() < len(verts)


def test_rasterize_depth_plane():
    from nice_slam_tpu.mesh.native import rasterize_depth
    verts = np.array([[-1, -1, 2], [1, -1, 2], [1, 1, 2], [-1, 1, 2]],
                     np.float32)
    tris = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    d = rasterize_depth(verts, tris, np.eye(4), 50, 50, 31.5, 31.5, 64, 64)
    assert abs(d[32, 32] - 2.0) < 1e-4
    assert (d > 0).mean() > 0.5


def test_ply_roundtrip(tmp_path):
    from nice_slam_tpu.mesh.mesher import load_ply, save_ply
    verts = np.random.default_rng(0).random((17, 3)).astype(np.float32)
    tris = np.array([[0, 1, 2], [3, 4, 5], [6, 7, 8]], np.int32)
    colors = (verts * 255).astype(np.uint8)
    p = str(tmp_path / 'm.ply')
    save_ply(p, verts, tris, colors)
    v2, t2 = load_ply(p)
    np.testing.assert_allclose(v2, verts, atol=1e-6)
    np.testing.assert_array_equal(t2, tris)


def test_mesh_extraction_from_slam(tmp_path):
    """Map the synthetic box for one frame, extract a mesh, check the
    back wall appears near z=-1."""
    from nice_slam_tpu.engine.slam import SlamSystem
    from nice_slam_tpu.mesh.mesher import load_ply
    cfg = make_test_cfg(n_frames=5)
    cfg['meshing']['resolution'] = 48
    slam = SlamSystem(cfg, nice=True, output=str(tmp_path))
    slam.step(0)
    path = slam.mesh_now(0)   # async by default; join before reading
    slam.join_mesh()
    assert path is not None
    verts, tris = load_ply(path)
    assert len(verts) > 200 and len(tris) > 200
    # geometry sanity: mesh fits inside the padded bound, and some surface
    # lies near the back wall (z ~ -1) seen from the first camera
    assert verts[:, 2].min() > -1.4
    back = verts[np.abs(verts[:, 2] + 1.0) < 0.15]
    assert len(back) > 50


def test_async_meshing_produces_all_meshes(tmp_path):
    """Background meshing: the run loop must not lose or corrupt meshes;
    all cadence meshes + the final mesh exist after run() (which joins)."""
    import os
    from nice_slam_tpu.engine.slam import SlamSystem
    from nice_slam_tpu.mesh.mesher import load_ply
    cfg = make_test_cfg(n_frames=9)
    cfg['meshing']['resolution'] = 48
    cfg['mapping']['mesh_freq'] = 4
    slam = SlamSystem(cfg, nice=True, output=str(tmp_path))
    assert slam.mesh_async
    slam.run()
    files = sorted(os.listdir(os.path.join(str(tmp_path), 'mesh')))
    assert 'final_mesh.ply' in files
    assert any(f.endswith('_mesh.ply') and not f.startswith('final')
               for f in files), files
    for f in files:
        verts, tris = load_ply(os.path.join(str(tmp_path), 'mesh', f))
        assert len(verts) > 0
