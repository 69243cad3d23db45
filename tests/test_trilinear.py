"""Trilinear interpolation parity vs torch.nn.functional.grid_sample
(mode='bilinear', padding_mode='border', align_corners=True) — the exact op
the reference decoders rely on (decoder.py:186)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from nice_slam_tpu.ops.trilinear import (
    normalize_coords, sample_grid_feature, trilinear_interp)


def torch_grid_sample_ref(grid_xyzc, p_nor):
    """Run torch grid_sample with the reference's layout conventions.

    grid_xyzc: [Nx, Ny, Nz, C] (our layout).  Torch wants [1, C, D, H, W]
    where vgrid x indexes W; the reference stores [1, C, Nz, Ny, Nx] so that
    normalized (x, y, z) maps to (W=Nx, H=Ny, D=Nz).
    """
    g = torch.from_numpy(np.ascontiguousarray(
        np.transpose(grid_xyzc, (3, 2, 1, 0))))[None]  # [1, C, Nz, Ny, Nx]
    v = torch.from_numpy(p_nor)[None, :, None, None, :]  # [1, N, 1, 1, 3]
    out = F.grid_sample(g, v, padding_mode='border', align_corners=True,
                        mode='bilinear')
    return out[0, :, :, 0, 0].T.numpy()  # [N, C]


@pytest.mark.parametrize("shape", [(5, 7, 6), (2, 2, 2), (9, 3, 4)])
def test_matches_torch_grid_sample(shape):
    rng = np.random.default_rng(0)
    grid = rng.normal(size=(*shape, 8)).astype(np.float32)
    p_nor = rng.uniform(-1.3, 1.3, size=(200, 3)).astype(np.float32)
    ours = trilinear_interp(jnp.asarray(grid), jnp.asarray(p_nor))
    ref = torch_grid_sample_ref(grid, p_nor)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5)


def test_exact_at_nodes():
    rng = np.random.default_rng(1)
    grid = rng.normal(size=(4, 5, 6, 3)).astype(np.float32)
    # normalized coordinates of node (i,j,k): 2*i/(N-1)-1
    idx = np.array([[0, 0, 0], [3, 4, 5], [2, 1, 3]], dtype=np.float32)
    sizes = np.array([4, 5, 6], dtype=np.float32)
    p_nor = idx / (sizes - 1) * 2 - 1
    out = trilinear_interp(jnp.asarray(grid), jnp.asarray(p_nor))
    expect = np.stack([grid[0, 0, 0], grid[3, 4, 5], grid[2, 1, 3]])
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-6)


def test_normalize_coords():
    bound = jnp.array([[-2.0, 2.0], [0.0, 4.0], [1.0, 3.0]])
    p = jnp.array([[-2.0, 0.0, 1.0], [2.0, 4.0, 3.0], [0.0, 2.0, 2.0]])
    out = normalize_coords(p, bound)
    np.testing.assert_allclose(
        out, [[-1, -1, -1], [1, 1, 1], [0, 0, 0]], atol=1e-6)


@pytest.mark.parametrize("shape", [(5, 7, 6), (2, 2, 2), (9, 3, 4)])
def test_expanded_matches_baseline(shape):
    """ExpandedGrid path == baseline gather path (fwd), incl. border clamp."""
    from nice_slam_tpu.ops.trilinear import expand_grid
    rng = np.random.default_rng(2)
    nx, ny, nz = shape
    grid = rng.normal(size=(nx * ny * nz, 8)).astype(np.float32)
    bound = jnp.array([[-1.0, 2.0], [0.0, 1.0], [-3.0, -1.0]])
    p = rng.uniform(-3.5, 2.5, size=(300, 3)).astype(np.float32)
    base = sample_grid_feature(jnp.asarray(grid), jnp.asarray(p), bound,
                               shape)
    eg = expand_grid(jnp.asarray(grid), shape)
    fast = sample_grid_feature(eg, jnp.asarray(p), bound)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(base), atol=2e-5)


def test_expanded_grad_matches_baseline():
    """The expanded path's VJP (wide scatter + dense fold) equals the
    baseline scatter-add gradient."""
    import jax
    from nice_slam_tpu.ops.trilinear import expand_grid
    rng = np.random.default_rng(3)
    shape = (6, 5, 4)
    grid = rng.normal(size=(6 * 5 * 4, 4)).astype(np.float32)
    bound = jnp.array([[0.0, 1.0]] * 3)
    p = rng.uniform(-0.2, 1.2, size=(500, 3)).astype(np.float32)
    cot = rng.normal(size=(500, 4)).astype(np.float32)

    def base_loss(g):
        return jnp.vdot(sample_grid_feature(g, jnp.asarray(p), bound, shape),
                        jnp.asarray(cot))

    def fast_loss(g):
        return jnp.vdot(sample_grid_feature(
            expand_grid(g, shape), jnp.asarray(p), bound), jnp.asarray(cot))

    g0 = jax.grad(base_loss)(jnp.asarray(grid))
    g1 = jax.grad(fast_loss)(jnp.asarray(grid))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-4, atol=1e-4)


def test_prepare_grids_roundtrip():
    """prepare_grids expands flat grids once and is idempotent."""
    from nice_slam_tpu.models.grids import prepare_grids
    from nice_slam_tpu.ops.trilinear import ExpandedGrid
    rng = np.random.default_rng(4)
    shapes = (('fine', (4, 3, 2)), ('middle', (2, 2, 2)))
    grids = {name: jnp.asarray(
        rng.normal(size=(s[0] * s[1] * s[2], 3)).astype(np.float32))
        for name, s in shapes}
    out = prepare_grids(grids, shapes)
    assert all(isinstance(v, ExpandedGrid) for v in out.values())
    assert out['fine'].e.shape == (24, 24)
    again = prepare_grids(out, shapes)
    assert again['fine'] is out['fine']
    off = prepare_grids(grids, shapes, enable=False)
    assert off is grids


def test_gradient_flows_to_grid():
    import jax
    grid = jnp.ones((4, 4, 4, 2))
    bound = jnp.array([[0.0, 1.0]] * 3)
    p = jnp.array([[0.5, 0.5, 0.5]])

    def loss(g):
        return jnp.sum(sample_grid_feature(g, p, bound))

    g = jax.grad(loss)(grid)
    # weights of the 8 surrounding corners sum to 1 per channel
    np.testing.assert_allclose(float(jnp.sum(g)), 2.0, atol=1e-5)
    assert float(jnp.max(g)) < 1.0  # spread over corners
