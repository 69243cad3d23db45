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
the grid, which is exactly the gradient the mapper needs.  A fused Pallas
kernel can replace it per-call-site later without changing callers.
"""

from __future__ import annotations

import jax.numpy as jnp


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


def sample_grid_feature(grid: jnp.ndarray, p: jnp.ndarray,
                        bound: jnp.ndarray,
                        shape: tuple[int, int, int] | None = None
                        ) -> jnp.ndarray:
    """World points -> interpolated grid features (decoder.py:179-188).

    Args:
      grid: [Nx, Ny, Nz, C] or flat [M, C] with `shape`=(Nx, Ny, Nz).
      p: [N, 3] world points.
      bound: [3, 2] scene bound used for normalization (the coarse decoder
        passes an enlarged bound, NICE_SLAM.py:208).
    Returns:
      [N, C].
    """
    return trilinear_interp(grid, normalize_coords(p, bound), shape)
