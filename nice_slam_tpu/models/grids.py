"""Hierarchical feature-grid volumes (L1 state).

Functional parity targets:
  * bound loading / rounding:  /root/reference/src/NICE_SLAM.py:188-208
    (upper bound rounded up so the extent divides `bound_divisible`; the
    coarse decoder sees bound * coarse_bound_enlarge)
  * grid allocation:           /root/reference/src/NICE_SLAM.py:243-320
    (shape int(extent/grid_len) per axis, N(0, 0.01) init except the fine
    grid's N(0, 0.0001))

Layout: [Nx, Ny, Nz, c_dim] channel-last (see ops/trilinear.py for why the
reference's z/y/x axis swap disappears here).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

GRID_KEYS = ('coarse', 'middle', 'fine', 'color')


class GridConfig(NamedTuple):
    """Static grid geometry (config keys `grid_len.*`, `model.*`,
    `mapping.bound`)."""

    bound: tuple[tuple[float, float], ...]  # [3][2], after rounding
    coarse_grid_len: float = 2.0
    middle_grid_len: float = 0.32
    fine_grid_len: float = 0.16
    color_grid_len: float = 0.16
    c_dim: int = 32
    coarse_bound_enlarge: float = 2.0
    coarse: bool = True

    @property
    def bound_np(self) -> np.ndarray:
        return np.asarray(self.bound, dtype=np.float32)

    @property
    def coarse_bound_np(self) -> np.ndarray:
        return self.bound_np * self.coarse_bound_enlarge


def round_bound(raw_bound, bound_divisible: float, scale: float = 1.0
                ) -> tuple[tuple[float, float], ...]:
    """Scale the configured bound and round the upper edge up so each extent
    is divisible by `bound_divisible` (NICE_SLAM.py:196-201)."""
    b = np.asarray(raw_bound, dtype=np.float64) * scale
    extent = b[:, 1] - b[:, 0]
    b[:, 1] = (np.floor(extent / bound_divisible).astype(np.int64) + 1) \
        * bound_divisible + b[:, 0]
    return tuple((float(lo), float(hi)) for lo, hi in b)


def grid_shapes(cfg: GridConfig) -> dict[str, tuple[int, int, int]]:
    """Voxel counts per level: int(extent / grid_len) with truncation, the
    coarse level over the enlarged bound (NICE_SLAM.py:282-316)."""
    b = cfg.bound_np
    extent = b[:, 1] - b[:, 0]
    shapes = {
        'middle': tuple(int(v) for v in extent / cfg.middle_grid_len),
        'fine': tuple(int(v) for v in extent / cfg.fine_grid_len),
        'color': tuple(int(v) for v in extent / cfg.color_grid_len),
    }
    if cfg.coarse:
        shapes['coarse'] = tuple(
            int(v) for v in extent * cfg.coarse_bound_enlarge
            / cfg.coarse_grid_len)
    return shapes


def init_grids(key: jax.Array, cfg: GridConfig) -> dict[str, jnp.ndarray]:
    """Allocate and randomly initialize the feature volumes.

    N(0, 0.01) everywhere except the fine grid's N(0, 0.0001)
    (NICE_SLAM.py:289-316).  Stored FLAT as [Nx*Ny*Nz, c_dim]
    (x-major) — see ops/trilinear.py for the TPU layout rationale; the
    (nx, ny, nz) shapes live in `grid_shapes(cfg)` / SceneModel.
    """
    shapes = grid_shapes(cfg)
    stds = {'coarse': 0.01, 'middle': 0.01, 'fine': 0.0001, 'color': 0.01}
    grids = {}
    keys = jax.random.split(key, len(shapes))
    for k, (name, shape) in zip(keys, sorted(shapes.items())):
        m = shape[0] * shape[1] * shape[2]
        grids[name] = jax.random.normal(
            k, (m, cfg.c_dim), dtype=jnp.float32) * stds[name]
    return grids


def static_grid_shapes(cfg: GridConfig) -> tuple:
    """Hashable ((name, (nx, ny, nz)), ...) for SceneModel."""
    return tuple(sorted(grid_shapes(cfg).items()))


# Which volumes each render stage samples (models/decoders.nice_eval):
# coarse -> coarse only; middle -> middle; fine -> middle + fine;
# color -> middle + fine + color.
STAGE_NEEDS = {
    'coarse': ('coarse',),
    'middle': ('middle',),
    'fine': ('middle', 'fine'),
    'color': ('middle', 'fine', 'color'),
}


def prepare_grids(grids: dict[str, jnp.ndarray], grid_shapes_t: tuple,
                  enable: bool = True, stage: str | None = None) -> dict:
    """Corner-expand flat grids for the one-gathered-row-per-point fast path
    (ops/trilinear.ExpandedGrid).  Call once per fixed-grid evaluation scope
    (a tracking frame, a whole-image render, a mesh lattice query); the
    mapper instead calls it inside its scan body, where autodiff turns the
    expansion's transpose into a dense fold.  No-op for already-expanded
    entries or when disabled.

    `stage` limits the expansion to the volumes that stage actually samples
    (STAGE_NEEDS) — the expansion streams the whole volume (9x its size in
    HBM traffic each way under grad), so expanding the untouched fine+color
    volumes during the mapper's middle stage costs ~2 ms/iteration for
    nothing (scripts/ablate_map_step.py).  Unneeded volumes pass through
    raw (they are never sampled, so the raw buffers are dead operands).

    When fine and color are both needed with the same lattice shape they
    are concatenated channel-wise into one 'finecolor' buffer before
    expansion, so the fine/color stages pay ONE gathered (and, under grad,
    one scattered) row per point for both volumes; `nice_eval` splits the
    interpolated features.  The gradient flows through the concat back to
    the separate canonical grids automatically."""
    if not enable or not grids:
        return grids
    from nice_slam_tpu.ops.trilinear import ExpandedGrid, expand_grid
    shapes = dict(grid_shapes_t)
    need = set(STAGE_NEEDS[stage] if stage is not None else grids)
    out = {}
    fuse = ('fine' in need and 'color' in need
            and 'fine' in grids and 'color' in grids
            and not isinstance(grids['fine'], ExpandedGrid)
            and not isinstance(grids['color'], ExpandedGrid)
            and shapes.get('fine') == shapes.get('color'))
    for name, g in grids.items():
        if fuse and name in ('fine', 'color'):
            continue
        if name not in need or isinstance(g, ExpandedGrid):
            out[name] = g
        else:
            out[name] = expand_grid(g, shapes[name])
    if fuse:
        both = jnp.concatenate([grids['fine'], grids['color']], axis=-1)
        out['finecolor'] = expand_grid(both, shapes['fine'])
    return out


def grid_world_coords(cfg: GridConfig, name: str) -> np.ndarray:
    """World coordinates of every grid node, [Nx, Ny, Nz, 3].

    Matches the frustum-selection lattice (Mapper.py:116-120): nodes span the
    bound inclusively with `linspace(lo, hi, N)`.  The coarse grid spans the
    enlarged bound.
    """
    shapes = grid_shapes(cfg)
    nx, ny, nz = shapes[name]
    b = cfg.coarse_bound_np if name == 'coarse' else cfg.bound_np
    xs = np.linspace(b[0, 0], b[0, 1], nx)
    ys = np.linspace(b[1, 0], b[1, 1], ny)
    zs = np.linspace(b[2, 0], b[2, 1], nz)
    gx, gy, gz = np.meshgrid(xs, ys, zs, indexing='ij')
    return np.stack([gx, gy, gz], axis=-1).astype(np.float32)
