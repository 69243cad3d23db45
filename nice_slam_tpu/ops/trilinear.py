"""Trilinear feature-grid interpolation (the `grid_sample` replacement).

Functional parity target: `F.grid_sample(grid, p, mode='bilinear',
padding_mode='border', align_corners=True)` as used by every decoder
(/root/reference/src/conv_onet/models/decoder.py:179-188, 273-283) together
with `normalize_3d_coordinate` (/root/reference/src/common.py:280-295).

Layout: the reference stores grids channel-first with a z/y/x axis order
[1, C, Nz, Ny, Nx] (NICE_SLAM.py:286 swaps axes to satisfy torch's
grid_sample convention).  Here grids are the natural [Nx, Ny, Nz, C] —
channel-last suits TPU vector lanes and removes the axis swap entirely; the
pretrained-checkpoint importer transposes once at load time
(models/pretrain.py).

align_corners=True semantics: normalized coordinate u in [-1, 1] maps to
voxel index (u+1)/2 * (N-1).  Border padding: indices clamp to the grid.

The gather formulation below is pure XLA; its VJP is XLA's scatter-add into
the grid, which is exactly the gradient the mapper needs.

Expanded-corner layout (the TPU fast path): measured on TPU v5e, XLA's
gather/scatter cost is per-ROW (~15-25 ns gathered row, ~30-60 ns scattered
row) and nearly independent of row width up to 256 lanes.  The baseline
formulation pays 8 gathered rows per query point (one per trilinear
corner).  `expand_grid` precomputes E[m] = concat over the 2x2x2 corner
offsets of the edge-clamped neighbours of voxel m, so interpolation needs
ONE gathered row of 8C floats per point — 8x fewer rows.  The expansion is
dense (slice+concat), so under `jax.grad` its transpose is a dense
shifted-add fold and the scatter VJP collapses to one wide row-scatter per
point.  Callers that evaluate many points against fixed grids (tracking
scans, whole-image rendering, mesh lattice queries) build the expansion
once; the mapper rebuilds it each iteration inside its scan (the grids
change), which the row savings still pay for.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class ExpandedGrid:
    """Corner-expanded grid buffer: e[m] holds the 8 corner features of
    voxel m in (dx, dy, dz)-major order ([M, 8*C]); shape is the static
    (nx, ny, nz) (pytree aux data, so it never turns into a tracer)."""

    e: jnp.ndarray
    shape: tuple[int, int, int]

    def tree_flatten(self):
        return (self.e,), self.shape

    @classmethod
    def tree_unflatten(cls, shape, children):
        return cls(children[0], shape)


def normalize_coords(p: jnp.ndarray, bound: jnp.ndarray) -> jnp.ndarray:
    """World coordinates -> [-1, 1] within the scene bound.

    Args:
      p: [..., 3] world points.
      bound: [3, 2] min/max per axis.
    Returns:
      [..., 3] normalized coordinates.
    """
    lo = bound[:, 0]
    hi = bound[:, 1]
    return (p - lo) / (hi - lo) * 2.0 - 1.0


def trilinear_interp(grid: jnp.ndarray, p_nor: jnp.ndarray,
                     shape: tuple[int, int, int] | None = None
                     ) -> jnp.ndarray:
    """Trilinearly interpolate a feature grid at normalized points.

    Args:
      grid: [Nx, Ny, Nz, C] volume, or flat [Nx*Ny*Nz, C] with `shape`
        giving (Nx, Ny, Nz).  Flat 2D storage is the canonical on-device
        form: XLA's layout assignment on TPU sometimes picks exotic 4D
        layouts (e.g. x-minor) nondeterministically, and every executable
        whose chosen layout disagrees with the buffer pays a full relayout
        copy per call — a 300x slowdown observed on this op.  2D arrays
        have an unambiguous (row, lane) layout.
      p_nor: [N, 3] coordinates in [-1, 1] (x, y, z); out-of-range values
        clamp to the border (padding_mode='border').
    Returns:
      [N, C] interpolated features.
    """
    if shape is None:
        nx, ny, nz = grid.shape[:3]
    else:
        nx, ny, nz = shape
    sizes = jnp.array([nx, ny, nz], dtype=p_nor.dtype)
    # align_corners=True mapping, then clamp for border padding.
    idx = (p_nor + 1.0) * 0.5 * (sizes - 1.0)
    idx = jnp.clip(idx, 0.0, sizes - 1.0)

    i0 = jnp.floor(idx)
    frac = idx - i0
    i0 = i0.astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, jnp.array([nx - 1, ny - 1, nz - 1]))

    x0, y0, z0 = i0[:, 0], i0[:, 1], i0[:, 2]
    x1, y1, z1 = i1[:, 0], i1[:, 1], i1[:, 2]
    fx, fy, fz = frac[:, 0:1], frac[:, 1:2], frac[:, 2:3]

    flat = grid.reshape(-1, grid.shape[-1])

    def corner(xi, yi, zi):
        return flat[(xi * ny + yi) * nz + zi]

    c000 = corner(x0, y0, z0)
    c001 = corner(x0, y0, z1)
    c010 = corner(x0, y1, z0)
    c011 = corner(x0, y1, z1)
    c100 = corner(x1, y0, z0)
    c101 = corner(x1, y0, z1)
    c110 = corner(x1, y1, z0)
    c111 = corner(x1, y1, z1)

    c00 = c000 * (1 - fz) + c001 * fz
    c01 = c010 * (1 - fz) + c011 * fz
    c10 = c100 * (1 - fz) + c101 * fz
    c11 = c110 * (1 - fz) + c111 * fz
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    return c0 * (1 - fx) + c1 * fx


def expand_grid(grid: jnp.ndarray, shape: tuple[int, int, int]
                ) -> ExpandedGrid:
    """Build the corner-expanded buffer E [M, 8C] from a flat [M, C] grid.

    Dispatches to the Pallas streaming kernel on TPU (ops/pallas/expand.py:
    one HBM pass each way for the expansion and its gradient fold; the XLA
    slice+concat below materializes intermediate copies and measures ~4x
    slower in situ).  Set NSTPU_NO_PALLAS_EXPAND=1 to force the XLA path.
    """
    import os
    if (os.environ.get('NSTPU_NO_PALLAS_EXPAND') != '1'
            and jax.default_backend() == 'tpu'):
        from nice_slam_tpu.ops.pallas.expand import (
            expand_grid_pallas, pallas_expand_ok)
        flat = grid.reshape(-1, grid.shape[-1])
        if pallas_expand_ok(shape, flat.shape[-1]):
            return ExpandedGrid(expand_grid_pallas(flat, shape), shape)
    return expand_grid_xla(grid, shape)


def expand_grid_xla(grid: jnp.ndarray, shape: tuple[int, int, int]
                    ) -> ExpandedGrid:
    """XLA reference formulation of `expand_grid`.

    E[(x*ny+y)*nz+z] = concat(G[x+dx, y+dy, z+dz] for dx,dy,dz in {0,1}^3),
    with edge-clamped neighbours (border padding).  Dense slices+concat, so
    its autodiff transpose is a dense shifted-add fold (no scatter).
    """
    nx, ny, nz = shape
    g = grid.reshape(nx, ny, nz, grid.shape[-1])
    blocks = []
    for dx in (0, 1):
        gx = g if dx == 0 else jnp.concatenate([g[1:], g[-1:]], axis=0)
        for dy in (0, 1):
            gy = gx if dy == 0 else jnp.concatenate(
                [gx[:, 1:], gx[:, -1:]], axis=1)
            for dz in (0, 1):
                gz = gy if dz == 0 else jnp.concatenate(
                    [gy[:, :, 1:], gy[:, :, -1:]], axis=2)
                blocks.append(gz)
    e = jnp.concatenate(blocks, axis=-1)
    return ExpandedGrid(e.reshape(nx * ny * nz, -1), (nx, ny, nz))


def trilinear_interp_expanded(eg: ExpandedGrid, p_nor: jnp.ndarray
                              ) -> jnp.ndarray:
    """Trilinear interpolation from an `ExpandedGrid`: one gathered row per
    point.  Same border-padding / align_corners=True semantics as
    `trilinear_interp` (bit-equal up to f32 summation order)."""
    nx, ny, nz = eg.shape
    c = eg.e.shape[-1] // 8
    sizes = jnp.array([nx, ny, nz], dtype=p_nor.dtype)
    idx = (p_nor + 1.0) * 0.5 * (sizes - 1.0)
    idx = jnp.clip(idx, 0.0, sizes - 1.0)
    i0 = jnp.floor(idx)
    frac = idx - i0
    i0 = i0.astype(jnp.int32)
    m = (i0[:, 0] * ny + i0[:, 1]) * nz + i0[:, 2]
    rows = eg.e[m].reshape(-1, 2, 2, 2, c)
    fx = frac[:, 0].reshape(-1, 1, 1, 1, 1)
    fy = frac[:, 1].reshape(-1, 1, 1, 1, 1)
    fz = frac[:, 2].reshape(-1, 1, 1, 1, 1)
    wx = jnp.concatenate([1.0 - fx, fx], axis=1)
    wy = jnp.concatenate([1.0 - fy, fy], axis=2)
    wz = jnp.concatenate([1.0 - fz, fz], axis=3)
    return (rows * (wx * wy * wz)).sum(axis=(1, 2, 3))


def sample_grid_feature(grid: jnp.ndarray | ExpandedGrid, p: jnp.ndarray,
                        bound: jnp.ndarray,
                        shape: tuple[int, int, int] | None = None
                        ) -> jnp.ndarray:
    """World points -> interpolated grid features (decoder.py:179-188).

    Args:
      grid: [Nx, Ny, Nz, C], flat [M, C] with `shape`=(Nx, Ny, Nz), or an
        `ExpandedGrid` (the TPU fast path; `shape` ignored).
      p: [N, 3] world points.
      bound: [3, 2] scene bound used for normalization (the coarse decoder
        passes an enlarged bound, NICE_SLAM.py:208).
    Returns:
      [N, C].
    """
    if isinstance(grid, ExpandedGrid):
        return trilinear_interp_expanded(grid, normalize_coords(p, bound))
    if hasattr(grid, 'slab_h'):  # parallel.blocks.BlockedGrid (avoid cycle)
        from nice_slam_tpu.parallel.blocks import trilinear_interp_blocked
        return trilinear_interp_blocked(grid, normalize_coords(p, bound))
    return trilinear_interp(grid, normalize_coords(p, bound), shape)
