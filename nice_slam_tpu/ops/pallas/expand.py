"""Pallas TPU kernels: corner-expansion of feature grids and its transpose.

`ops/trilinear.expand_grid` builds E[m] = concat over the 2x2x2 corner
offsets of the edge-clamped neighbours of voxel m (see that module for why
the expanded layout is the TPU fast path).  The mapper rebuilds E every
optimization iteration (the grids change under Adam), and its autodiff
transpose (the fold of dE back onto the canonical grid) runs every backward
pass.  Both are pure data movement — read G (M*C floats), write E (8x) —
but the XLA slice+concat formulation materializes intermediate copies and
measures ~4-6x off HBM speed-of-light in situ (scripts/ablate_map_step.py:
~1.2 ms/iter expansion + a comparable share of the 2.4 ms/iter grid-grad
path at the Replica room0 fine+color volume).

These kernels stream the volume once:
  * expand: grid over x-planes; each program reads plane x and the clamped
    plane x+1 and emits the [P, 8C] expanded plane with the y/z shifts done
    as in-VMEM row shifts + boundary selects (P = ny*nz rows, row m of a
    plane has y = m // nz, z = m % nz).
  * fold (the exact transpose): each program reads dE planes x and x-1 and
    accumulates the transposed shifts, including the clamp contributions at
    the x/y/z upper boundaries.

`expand_grid_pallas` carries a jax.custom_vjp whose backward IS the fold
kernel, so the mapper's gradient path uses it automatically.  Non-TPU
backends run the same kernels under `interpret=True` (tests) or fall back
to the XLA formulation (`ops.trilinear.expand_grid`).

Corner/channel order matches ops/trilinear.expand_grid exactly:
corner k = dx*4 + dy*2 + dz occupies channels [k*C, (k+1)*C).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for the plane-streaming kernels (see _plane_bytes).
_VMEM_LIMIT_BYTES = 15 * 1024 * 1024

# Mosaic's scoped-vmem stack model is shape-dependent and our chunk-size
# model (below) has measured up to ~1.6x error (19.14 MB actual vs 12.1 MB
# modelled at the Apartment fine shape 107x53x82xC32), so the CHUNKED call
# sites raise the compiler's scoped-vmem cap well above the 16 MB default
# (v5e/v6e have 128 MB VMEM); the chunk selector still TARGETS 15 MB so
# double-buffering efficiency is unchanged — the cap is headroom against
# model error, not a bigger working set.  The non-chunked paths use a cap
# DERIVED from the plane model (`_small_shape_params`) so Mosaic still
# catches working-set regressions there (round-4 advisor note).
_COMPILER_PARAMS_CHUNKED = pltpu.CompilerParams(
    vmem_limit_bytes=100 * 1024 * 1024)


def _small_shape_params(ny: int, nz: int, c: int) -> pltpu.CompilerParams:
    """Scoped-vmem cap for the NON-chunked call sites: 1.5x the modelled
    plane working set, floored at Mosaic's 16 MB default.  Tiny test
    shapes keep the default guard (catching working-set regressions, the
    round-4 advisor note); the Replica-scale fold — modelled 14.9 MB,
    measured 14.3 MB, uncomfortably near the default cap — gets derived
    headroom against the model's error rather than a blanket 100 MB."""
    return pltpu.CompilerParams(vmem_limit_bytes=max(
        16 * 1024 * 1024, int(1.5 * _plane_bytes(ny, nz, c))))


def _plane_masks(ny: int, nz: int) -> np.ndarray:
    """[P, 2] f32: col 0 = 1.0 where z == nz-1, col 1 = 1.0 where y == ny-1."""
    y = np.repeat(np.arange(ny), nz)
    z = np.tile(np.arange(nz), ny)
    return np.stack([(z == nz - 1), (y == ny - 1)],
                    axis=-1).astype(np.float32)


def _shift_up(v: jnp.ndarray, k: int) -> jnp.ndarray:
    """Rows i -> i+k with the tail replicated (tail rows are always masked
    out by the boundary selects before use)."""
    if k == 0:
        return v
    return jnp.concatenate([v[k:], jnp.repeat(v[-1:], k, axis=0)], axis=0)


def _shift_down(v: jnp.ndarray, k: int) -> jnp.ndarray:
    """out[i] = v[i-k] with a zero head (transpose of a masked `_shift_up`).

    Implemented as a circular roll + mask: Mosaic cannot concatenate
    sublane-offset slices whose lane offset is not tile-aligned (the fold's
    corner slices start at lane 64 when C == 64), but roll handles any
    layout."""
    if k == 0:
        return v
    rows = jax.lax.broadcasted_iota(jnp.int32, (v.shape[0], 1), 0)
    return jnp.where(rows >= k, pltpu.roll(v, k, 0), 0.0)


def _expand_kernel(nz: int, cur_ref, nxt_ref, mask_ref, out_ref):
    cur = cur_ref[0]
    nxt = nxt_ref[0]
    zlast = mask_ref[:, 0:1]
    ylast = mask_ref[:, 1:2]

    def sz(v):
        return jnp.where(zlast > 0, v, _shift_up(v, 1))

    def sy(v):
        return jnp.where(ylast > 0, v, _shift_up(v, nz))

    blocks = []
    for base in (cur, nxt):          # dx = 0, 1
        b_y = (base, sy(base))       # dy = 0, 1
        for by in b_y:
            blocks.append(by)        # dz = 0
            blocks.append(sz(by))    # dz = 1
    # loop order above emits (dx, dy, dz) = 000,001,010,011,100,...
    out_ref[0] = jnp.concatenate(blocks, axis=-1)


def _fold_kernel(nz: int, c: int, nx: int, cur_ref, prv_ref, mask_ref,
                 out_ref):
    """Transpose of `_expand_kernel`.

    d_G[a,b,cc] = sum over corners k=(dx,dy,dz) of d_E_k at the source
    positions that clamp-map onto (a,b,cc):
      x axis: plane a-dx, plus plane a itself when a == nx-1 and dx == 1;
      y/z axes: the in-plane transposed shifts (with the same clamp rule).
    """
    x = pl.program_id(0)
    cur = cur_ref[0]                      # d_E plane x     [P, 8C]
    prv = prv_ref[0]                      # d_E plane x-1 (clamped at 0)
    zlast = mask_ref[:, 0:1]
    ylast = mask_ref[:, 1:2]

    def szT(w):
        # transpose of sz: w[j]*zlast[j] + (w*(1-zlast)) shifted down by 1
        return zlast * w + _shift_down((1.0 - zlast) * w, 1)

    def syT(w):
        return ylast * w + _shift_down((1.0 - ylast) * w, nz)

    def corner(plane, k):
        w = plane[:, k * c:(k + 1) * c]
        dx, rem = divmod(k, 4)
        dy, dz = divmod(rem, 2)
        if dz:
            w = szT(w)
        if dy:
            w = syT(w)
        return w

    acc = corner(cur, 0) + corner(cur, 1) + corner(cur, 2) + corner(cur, 3)
    # dx=1 corners arrive from the previous plane (dropped at x == 0) ...
    from_prev = (corner(prv, 4) + corner(prv, 5) + corner(prv, 6)
                 + corner(prv, 7))
    acc = acc + jnp.where(x > 0, 1.0, 0.0) * from_prev
    # ... and, at the clamped top plane, additionally from plane nx-1 itself.
    from_self = (corner(cur, 4) + corner(cur, 5) + corner(cur, 6)
                 + corner(cur, 7))
    acc = acc + jnp.where(x == nx - 1, 1.0, 0.0) * from_self
    out_ref[0] = acc


def _plane_bytes(ny: int, nz: int, c: int) -> int:
    """Estimated Mosaic VMEM stack peak for the FOLD kernel (the larger of
    the two): measured ~6.7x the [P, 8C] plane size at (P=1444, C=64) —
    the 19.72 MB scoped-vmem OOM at the TUM fr1 grid shape — vs ~6.7x
    14.3 MB fitting at the Replica shape (P=1040).  Model it as 7 plane
    widths of 8C."""
    p = ny * nz
    return 4 * p * 7 * (8 * c)


def _align_lines(nz: int) -> int:
    """Smallest y-line count H with H*nz divisible by 8 (Mosaic requires
    sublane block extents divisible by 8); chunk sizes and halo blocks are
    H-line multiples."""
    import math as _math
    return 8 // _math.gcd(nz, 8)


def _chunk_bytes(by: int, nz: int, c: int) -> int:
    """VMEM model for the CHUNKED fold kernel: the 7-width plane model
    plus two extra full-chunk 8C halo blocks."""
    return 4 * by * nz * 9 * (8 * c)


def _rows_per_chunk(ny: int, nz: int, c: int) -> int:
    """y-lines per chunk for the chunked kernels: the largest H-aligned
    count whose VMEM estimate fits (minimum one alignment unit;
    H = _align_lines(nz) keeps Mosaic's sublane-extent rule)."""
    h = _align_lines(nz)
    by = -(-ny // h) * h
    while by > h and _chunk_bytes(by, nz, c) > _VMEM_LIMIT_BYTES:
        by = -(-(by // 2) // h) * h
    return by


def pallas_expand_ok(shape: tuple[int, int, int], c: int) -> bool:
    """Whether the streaming kernels can run: large planes are chunked
    along y (halo = the neighbouring chunk), so only a single alignment
    unit overflowing VMEM forces the XLA fallback."""
    nx, ny, nz = shape
    return _chunk_bytes(_align_lines(nz), nz, c) <= _VMEM_LIMIT_BYTES


# ---------------------------------------------------------------------------
# Chunked variants: planes too large for VMEM are split along y; the only
# cross-chunk dependency is ONE y-line (the y+1 shift and its transpose),
# passed as an extra clamped-index block.  Masks are computed in-kernel
# from the global y/z of each row.
# ---------------------------------------------------------------------------

def _row_coords(by: int, nz: int, j, ny: int):
    rows = jax.lax.broadcasted_iota(jnp.int32, (by * nz, 1), 0)
    z = rows % nz
    y = j * by + rows // nz
    return (z == nz - 1), (y == ny - 1)


def _expand_kernel_chunked(nz: int, ny: int, by: int, cur_ref, curh_ref,
                           nxt_ref, nxth_ref, out_ref):
    # Halo refs hold the NEXT y-chunk of the plane (block index clamped at
    # the top); only its first y-line is consumed — via a circular roll,
    # because Mosaic cannot concatenate vectors whose internal sublane/
    # lane offsets disagree (round-2 TUM failure: concat of a 38-row halo
    # with an offset-6 722-row slice).
    j = pl.program_id(1)
    cur = cur_ref[0]
    nxt = nxt_ref[0]
    zlast, ylast = _row_coords(by, nz, j, ny)
    n = by * nz
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)

    def sz(v):
        # row z+1 within the y-line; the wrap row always has z == nz-1
        return jnp.where(zlast, v, pltpu.roll(v, n - 1, 0))

    def sy(v, halo):
        shifted = jnp.where(rows < n - nz, pltpu.roll(v, n - nz, 0),
                            pltpu.roll(halo, n - nz, 0))
        return jnp.where(ylast, v, shifted)

    blocks = []
    for base, halo in ((cur, curh_ref[0]), (nxt, nxth_ref[0])):
        for byv in (base, sy(base, halo)):
            blocks.append(byv)
            blocks.append(sz(byv))
    out_ref[0] = jnp.concatenate(blocks, axis=-1)


def _fold_kernel_chunked(nz: int, c: int, nx: int, ny: int, by: int,
                         cur_ref, curh_ref, prv_ref, prvh_ref, out_ref):
    # Halo refs hold the PREVIOUS y-chunk of the corresponding plane
    # (block index clamped at 0; kernel zeroes its contribution at
    # j == 0); only its last y-line is consumed, via a circular roll.
    x = pl.program_id(0)
    j = pl.program_id(1)
    cur = cur_ref[0]
    prv = prv_ref[0]
    zlast, ylast = _row_coords(by, nz, j, ny)
    zl = zlast.astype(cur.dtype)
    yl = ylast.astype(cur.dtype)
    n = by * nz
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    jgate = jnp.where(j > 0, 1.0, 0.0).astype(cur.dtype)

    def szT(w):
        return zl * w + _shift_down((1.0 - zl) * w, 1)

    def syT(w, hw):
        # transpose of sy: out[y] += w[y-1]; the y==ny-1 line additionally
        # keeps its own (clamped) contribution.  The y-1 line of this
        # chunk's first row is the halo chunk's last line (rolled to the
        # head; its y can never be ny-1, and there is none at j == 0).
        shifted = jnp.where(rows < nz, jgate * pltpu.roll(hw, nz, 0),
                            pltpu.roll((1.0 - yl) * w, nz, 0))
        return yl * w + shifted

    def corner(plane, halo, k):
        w = plane[:, k * c:(k + 1) * c]
        dx, rem = divmod(k, 4)
        dy, dz = divmod(rem, 2)
        if dz:
            w = szT(w)
        if dy:
            # the halo chunk feeds syT's head and must carry the same
            # z-transpose as the body (szT acts within a y-line; the
            # halo chunk has the identical z layout, and its own head
            # row — zeroed by _shift_down — is never consumed)
            hh = halo[:, k * c:(k + 1) * c]
            if dz:
                hh = szT(hh)
            w = syT(w, hh)
        return w

    ch = curh_ref[0]
    ph = prvh_ref[0]
    acc = (corner(cur, ch, 0) + corner(cur, ch, 1)
           + corner(cur, ch, 2) + corner(cur, ch, 3))
    from_prev = (corner(prv, ph, 4) + corner(prv, ph, 5)
                 + corner(prv, ph, 6) + corner(prv, ph, 7))
    acc = acc + jnp.where(x > 0, 1.0, 0.0) * from_prev
    from_self = (corner(cur, ch, 4) + corner(cur, ch, 5)
                 + corner(cur, ch, 6) + corner(cur, ch, 7))
    acc = acc + jnp.where(x == nx - 1, 1.0, 0.0) * from_self
    out_ref[0] = acc


def _pad_y(a3: jnp.ndarray, ny: int, nz: int, by: int) -> tuple:
    """Zero-pad the plane rows so ny is a by-multiple; returns (arr, ny_p)."""
    n_chunks = -(-ny // by)
    ny_p = n_chunks * by
    if ny_p != ny:
        a3 = jnp.pad(a3, ((0, 0), (0, (ny_p - ny) * nz), (0, 0)))
    return a3, ny_p


def _expand_call_chunked(grid_flat, shape, interpret, by):
    nx, ny, nz = shape
    c = grid_flat.shape[-1]
    assert by % _align_lines(nz) == 0, (by, nz)
    g3, ny_p = _pad_y(grid_flat.reshape(nx, ny * nz, c), ny, nz, by)
    n_chunks = ny_p // by
    out = pl.pallas_call(
        functools.partial(_expand_kernel_chunked, nz, ny, by),
        out_shape=jax.ShapeDtypeStruct((nx, ny_p * nz, 8 * c),
                                       grid_flat.dtype),
        grid=(nx, n_chunks),
        in_specs=[
            pl.BlockSpec((1, by * nz, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            # next y-chunk (first line consumed; clamped at the top)
            pl.BlockSpec((1, by * nz, c),
                         lambda i, j, nc=n_chunks: (
                             i, jnp.minimum(j + 1, nc - 1), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, by * nz, c),
                         lambda i, j, nx=nx: (jnp.minimum(i + 1, nx - 1),
                                              j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, by * nz, c),
                         lambda i, j, nx=nx, nc=n_chunks: (
                             jnp.minimum(i + 1, nx - 1),
                             jnp.minimum(j + 1, nc - 1), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, by * nz, 8 * c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS_CHUNKED,
    )(g3, g3, g3, g3)
    return out[:, :ny * nz].reshape(nx * ny * nz, 8 * c)


def _fold_call_chunked(de_flat, shape, interpret, by):
    nx, ny, nz = shape
    c8 = de_flat.shape[-1]
    c = c8 // 8
    assert by % _align_lines(nz) == 0, (by, nz)
    d3, ny_p = _pad_y(de_flat.reshape(nx, ny * nz, c8), ny, nz, by)
    n_chunks = ny_p // by
    out = pl.pallas_call(
        functools.partial(_fold_kernel_chunked, nz, c, nx, ny, by),
        out_shape=jax.ShapeDtypeStruct((nx, ny_p * nz, c), de_flat.dtype),
        grid=(nx, n_chunks),
        in_specs=[
            pl.BlockSpec((1, by * nz, c8), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            # previous y-chunk (last line consumed; zeroed at j == 0)
            pl.BlockSpec((1, by * nz, c8),
                         lambda i, j: (i, jnp.maximum(j - 1, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, by * nz, c8),
                         lambda i, j: (jnp.maximum(i - 1, 0), j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, by * nz, c8),
                         lambda i, j: (jnp.maximum(i - 1, 0),
                                       jnp.maximum(j - 1, 0), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, by * nz, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS_CHUNKED,
    )(d3, d3, d3, d3)
    return out[:, :ny * nz].reshape(nx * ny * nz, c)


def _expand_call(grid_flat: jnp.ndarray, shape: tuple[int, int, int],
                 interpret: bool) -> jnp.ndarray:
    nx, ny, nz = shape
    c = grid_flat.shape[-1]
    p = ny * nz
    if _plane_bytes(ny, nz, c) > _VMEM_LIMIT_BYTES:
        return _expand_call_chunked(grid_flat, shape, interpret,
                                    _rows_per_chunk(ny, nz, c))
    g3 = grid_flat.reshape(nx, p, c)
    masks = jnp.asarray(_plane_masks(ny, nz))
    out = pl.pallas_call(
        functools.partial(_expand_kernel, nz),
        out_shape=jax.ShapeDtypeStruct((nx, p, 8 * c), grid_flat.dtype),
        grid=(nx,),
        in_specs=[
            pl.BlockSpec((1, p, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, c),
                         lambda i: (jnp.minimum(i + 1, nx - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p, 2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, p, 8 * c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=_small_shape_params(ny, nz, c),
    )(g3, g3, masks)
    return out.reshape(nx * p, 8 * c)


def _fold_call(de_flat: jnp.ndarray, shape: tuple[int, int, int],
               interpret: bool) -> jnp.ndarray:
    nx, ny, nz = shape
    c8 = de_flat.shape[-1]
    c = c8 // 8
    p = ny * nz
    if _plane_bytes(ny, nz, c) > _VMEM_LIMIT_BYTES:
        return _fold_call_chunked(de_flat, shape, interpret,
                                  _rows_per_chunk(ny, nz, c))
    d3 = de_flat.reshape(nx, p, c8)
    masks = jnp.asarray(_plane_masks(ny, nz))
    out = pl.pallas_call(
        functools.partial(_fold_kernel, nz, c, nx),
        out_shape=jax.ShapeDtypeStruct((nx, p, c), de_flat.dtype),
        grid=(nx,),
        in_specs=[
            pl.BlockSpec((1, p, c8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, c8),
                         lambda i: (jnp.maximum(i - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p, 2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, p, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=_small_shape_params(ny, nz, c),
    )(d3, d3, masks)
    return out.reshape(nx * p, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def expand_grid_pallas(grid_flat: jnp.ndarray, shape: tuple[int, int, int],
                       interpret: bool = False) -> jnp.ndarray:
    """Corner-expand a flat [M, C] grid to [M, 8C] (Pallas fast path).

    Bit-identical to `ops.trilinear.expand_grid(...).e`; backward pass is
    the streaming fold kernel (the exact transpose).
    """
    return _expand_call(grid_flat, shape, interpret)


def _expand_fwd(grid_flat, shape, interpret):
    return _expand_call(grid_flat, shape, interpret), None


def _expand_bwd(shape, interpret, _res, g):
    return (_fold_call(g, shape, interpret),)


expand_grid_pallas.defvjp(_expand_fwd, _expand_bwd)
