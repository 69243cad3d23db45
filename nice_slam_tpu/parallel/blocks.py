"""Grid-block tensor parallelism: feature volumes sharded over a mesh axis
with one-plane halo exchange for the trilinear stencil.

This is the SURVEY.md §2.3 "tensor parallel" row: each device owns an
x-major slab of every feature volume (the flat [M, C] buffers are x-major,
so a contiguous row range IS an x-slab).  The trilinear stencil reads
planes x0 and x0+1, so a slab plus ONE halo plane (the next shard's first
plane, fetched with `ppermute` over ICI) makes every interpolation whose
base cell lies in the slab fully local.

Execution model on a 2-D mesh ('block', 'rays'):

  * every device draws the ray subset of its 'rays' coordinate (the PRNG is
    folded with the rays index ONLY, so all block-devices of a column see
    identical rays);
  * each device interpolates the sample points that land in its slab
    (others masked to zero) and a `psum` over 'block' assembles complete
    features — the only cross-block communication in the forward pass;
  * the decoder MLP then runs replicated across the block axis (its
    parameters are tiny); under autodiff the psum transposes to identity,
    so every device receives the full feature cotangent and its slab
    gradient is exact and LOCAL — grid gradients are never all-reduced
    over 'block', only over 'rays' (they ride ICI once per iteration);
  * the halo plane's gradient flows back to its owner through the
    transpose of the `ppermute` (JAX inverts the permutation
    automatically);
  * pose/decoder gradients are block-replicated by construction and psum
    only over 'rays' (the Schur-style reduction of SURVEY.md §2.3).

At NICE-SLAM scale the volumes (10-50 MB) fit replicated in HBM, so this
layout pays off only when grids outgrow a chip (city-scale scenes, higher
c_dim, finer voxels); it is implemented and tested here so the framework
scales past that point without redesign (tests/test_blocked.py runs it on
an 8-virtual-device CPU mesh and checks exactness against the replicated
path).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from nice_slam_tpu.engine.mapper import (
    MapperConfig, build_stage_losses, scan_map_iters)
from nice_slam_tpu.core.cameras import Intrinsics
from nice_slam_tpu.render.renderer import RenderConfig, SceneModel


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class BlockedGrid:
    """Per-device slab view of a feature volume inside `shard_map`.

    slab_h:   [(local_nx + 1) * ny * nz, C] — the owned x-slab with the
              right-neighbour halo plane appended (row-major x, y, z).
    x_start:  [] int32 — global x index of the slab's first plane (traced:
              axis_index * local_nx).
    shape:    true global (nx, ny, nz) — nx is the UNPADDED plane count, so
              border clamping matches the unsharded grid exactly.
    local_nx: planes owned per shard (nx padded up to the block count,
              divided).
    axis:     mesh axis name the volume is sharded over.
    """

    slab_h: jnp.ndarray
    x_start: jnp.ndarray
    shape: tuple[int, int, int]
    local_nx: int
    axis: str

    def tree_flatten(self):
        return (self.slab_h, self.x_start), (self.shape, self.local_nx,
                                             self.axis)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], *aux)


def halo_exchange(slab: jnp.ndarray, local_nx: int, ny: int, nz: int,
                  axis: str) -> jnp.ndarray:
    """Append the right neighbour's first x-plane to the slab.

    slab: [local_nx * ny * nz, C] (x-major rows).  The exchange is a single
    `ppermute` of one [ny * nz, C] plane to the left neighbour over ICI.
    The last shard receives a wrapped plane it never reads (its points
    clamp to x <= nx - 1, inside its own slab), and in the transpose it
    therefore carries zero gradient back.
    """
    n = jax.lax.axis_size(axis)
    first_plane = slab[:ny * nz]
    perm = [(i, (i - 1) % n) for i in range(n)]
    halo = jax.lax.ppermute(first_plane, axis, perm)
    return jnp.concatenate([slab, halo], axis=0)


def make_blocked(slab: jnp.ndarray, shape: tuple[int, int, int],
                 local_nx: int, axis: str) -> BlockedGrid:
    """Wrap a device-local slab (inside shard_map) as a BlockedGrid."""
    _, ny, nz = shape
    x_start = jax.lax.axis_index(axis) * local_nx
    return BlockedGrid(halo_exchange(slab, local_nx, ny, nz, axis),
                       x_start, shape, local_nx, axis)


def _corner_geometry(shape, local_nx, x_start, p_nor):
    """Shared fwd/bwd geometry: local corner row indices, lerp fractions,
    ownership mask, and the in-range (unclipped) mask per axis."""
    nx, ny, nz = shape
    sizes = jnp.array([nx, ny, nz], dtype=p_nor.dtype)
    raw = (p_nor + 1.0) * 0.5 * (sizes - 1.0)
    idx = jnp.clip(raw, 0.0, sizes - 1.0)
    in_range = (raw >= 0.0) & (raw <= sizes - 1.0)  # clip passes grad here
    i0 = jnp.floor(idx)
    frac = idx - i0
    i0 = i0.astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, jnp.array([nx - 1, ny - 1, nz - 1]))

    x0g = i0[:, 0]
    mine = (x0g >= x_start) & (x0g < x_start + local_nx)
    # Local x offsets; x1 may land on the halo plane (offset == local_nx).
    x0 = jnp.clip(x0g - x_start, 0, local_nx)
    x1 = jnp.clip(i1[:, 0] - x_start, 0, local_nx)

    def row(xi, yi, zi):
        return (xi * ny + yi) * nz + zi

    rows = jnp.stack([row(x, y, z)
                      for x in (x0, x1)
                      for y in (i0[:, 1], i1[:, 1])
                      for z in (i0[:, 2], i1[:, 2])], axis=1)  # [N, 8]
    return rows, frac, mine, in_range, sizes


def _corner_weights(frac):
    """[N, 8] trilinear weights in (dx, dy, dz)-major corner order."""
    fx, fy, fz = frac[:, 0:1], frac[:, 1:2], frac[:, 2:3]
    wx = jnp.concatenate([1.0 - fx, fx], axis=1)           # [N, 2]
    wy = jnp.concatenate([1.0 - fy, fy], axis=1)
    wz = jnp.concatenate([1.0 - fz, fz], axis=1)
    return (wx[:, :, None, None] * wy[:, None, :, None]
            * wz[:, None, None, :]).reshape(-1, 8)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _blocked_interp(shape, local_nx, axis, slab_h, p_nor):
    """Core blocked interpolation with an EXPLICIT gradient routing.

    Forward: each device gathers the 8 corners of the points whose base
    cell lies in its slab and `psum`s over the block axis.

    The custom VJP pins the cross-block gradient semantics (shard_map with
    check_vma=False leaves collective transposes underdetermined for this
    mixed replicated/partitioned pattern):
      * d slab_h: local scatter-add of the owned points' weighted
        cotangents — exact without any collective (each slab's rows are
        owned by exactly one device; the halo plane's gradient rides the
        transpose of `halo_exchange`'s ppermute back to its owner);
      * d p_nor: the spatial derivative is only computable where the
        features live, so each device produces its owned points' rows and
        a psum over 'block' re-replicates the full [N, 3] — keeping every
        downstream (pose) gradient replicated-consistent, exactly like the
        forward points themselves.
    """
    x_start = jax.lax.axis_index(axis) * local_nx
    rows, frac, mine, _, _ = _corner_geometry(shape, local_nx, x_start,
                                              p_nor)
    w = _corner_weights(frac)                                # [N, 8]
    feats = slab_h[rows]                                     # [N, 8, C]
    out = jnp.einsum('nkc,nk->nc', feats, w)
    out = jnp.where(mine[:, None], out, 0.0)
    return jax.lax.psum(out, axis)


def _blocked_interp_fwd(shape, local_nx, axis, slab_h, p_nor):
    return _blocked_interp(shape, local_nx, axis, slab_h, p_nor), \
        (slab_h, p_nor)


def _blocked_interp_bwd(shape, local_nx, axis, res, ct):
    slab_h, p_nor = res
    x_start = jax.lax.axis_index(axis) * local_nx
    rows, frac, mine, in_range, sizes = _corner_geometry(
        shape, local_nx, x_start, p_nor)
    w = _corner_weights(frac)
    ct_owned = jnp.where(mine[:, None], ct, 0.0)             # [N, C]

    # d slab: scatter-add w_k * ct into the owned corner rows.
    d_slab = jnp.zeros_like(slab_h).at[rows.reshape(-1)].add(
        (w[:, :, None] * ct_owned[:, None, :]).reshape(-1, slab_h.shape[-1]))

    # d p_nor: d out / d frac via corner differences, chained through
    # idx = (p+1)/2*(size-1) (clip gradient zero outside range).
    feats = slab_h[rows].reshape(-1, 2, 2, 2, slab_h.shape[-1])
    fx, fy, fz = frac[:, 0:1], frac[:, 1:2], frac[:, 2:3]
    wx = jnp.concatenate([1.0 - fx, fx], axis=1)
    wy = jnp.concatenate([1.0 - fy, fy], axis=1)
    wz = jnp.concatenate([1.0 - fz, fz], axis=1)
    gx = jnp.einsum('nyzc,ny,nz,nc->n',
                    feats[:, 1] - feats[:, 0], wy, wz, ct_owned)
    gy = jnp.einsum('nxzc,nx,nz,nc->n',
                    feats[:, :, 1] - feats[:, :, 0], wx, wz, ct_owned)
    gz = jnp.einsum('nxyc,nx,ny,nc->n',
                    feats[:, :, :, 1] - feats[:, :, :, 0], wx, wy, ct_owned)
    d_idx = jnp.stack([gx, gy, gz], axis=-1)
    d_p = d_idx * jnp.where(in_range, 1.0, 0.0) * 0.5 * (sizes - 1.0)
    d_p = jax.lax.psum(d_p, axis)   # re-replicate, like the forward points
    return d_slab, d_p


_blocked_interp.defvjp(_blocked_interp_fwd, _blocked_interp_bwd)


def trilinear_interp_blocked(bg: BlockedGrid, p_nor: jnp.ndarray
                             ) -> jnp.ndarray:
    """Trilinear interpolation against a blocked volume (align_corners=True,
    border clamp) — matches ops.trilinear.trilinear_interp up to f32
    summation order; see `_blocked_interp` for the gradient contract."""
    return _blocked_interp(bg.shape, bg.local_nx, bg.axis, bg.slab_h, p_nor)


def plan_blocks(grid_shapes_t: tuple, n_block: int) -> dict[str, dict]:
    """Static padding/sharding plan per volume.

    Returns {name: {'shape', 'local_nx', 'nx_pad', 'rows_pad'}} where
    nx_pad = local_nx * n_block >= nx.  Padded planes hold zeros and are
    never read (points clamp to the true nx), so their gradients stay zero.
    """
    plan = {}
    for name, (nx, ny, nz) in dict(grid_shapes_t).items():
        local_nx = -(-nx // n_block)
        nx_pad = local_nx * n_block
        plan[name] = {'shape': (nx, ny, nz), 'local_nx': local_nx,
                      'nx_pad': nx_pad, 'rows_pad': nx_pad * ny * nz}
    return plan


def pad_for_blocks(flat_grids: dict[str, jnp.ndarray], plan: dict
                   ) -> dict[str, jnp.ndarray]:
    """Zero-pad flat [M, C] volumes to the blocked row count (host side)."""
    out = {}
    for name, g in flat_grids.items():
        rows = plan[name]['rows_pad']
        out[name] = jnp.pad(g, ((0, rows - g.shape[0]), (0, 0)))
    return out


def unpad_from_blocks(padded: dict[str, jnp.ndarray], plan: dict,
                      grid_shapes_t: tuple) -> dict[str, jnp.ndarray]:
    """Strip the block padding back off (host side)."""
    shapes = dict(grid_shapes_t)
    return {name: g[:int(np.prod(shapes[name]))]
            for name, g in padded.items()}


def make_blocked_map_step(*, mesh: jax.sharding.Mesh, model: SceneModel,
                          rcfg: RenderConfig, mcfg: MapperConfig,
                          intr: Intrinsics, n_frames: int, n_iters: int,
                          pix_per_frame: int):
    """Mapping step with grids sharded over mesh axis 'block' and rays over
    'rays' (both axes must exist in `mesh`; sizes may be 1).

    Signature matches engine.mapper.make_map_step, except
    opt_params['grids'] / masks must be padded with `pad_for_blocks` (they
    enter and leave sharded P('block')).
    """
    assert model.kind == 'nice', 'blocked mode shards NICE feature volumes'
    n_block = mesh.shape['block']
    n_rays = mesh.shape['rays']
    local_pix = max(pix_per_frame // n_rays, 1)
    plan = plan_blocks(model.grid_shapes, n_block)

    # The blocked gather path replaces the expanded-corner layout.
    blocked_model = model._replace(expanded=False)
    _, loss_fns = build_stage_losses(
        model=blocked_model, rcfg=rcfg, mcfg=mcfg, intr=intr,
        n_frames=n_frames, pix_per_frame=local_pix)

    def to_blocked(slabs: dict[str, jnp.ndarray]) -> dict[str, BlockedGrid]:
        return {name: make_blocked(slab, plan[name]['shape'],
                                   plan[name]['local_nx'], 'block')
                for name, slab in slabs.items()}

    def blocked_grad(loss_fn):
        def local(opt_p, frozen_dec, colors, depths, key):
            kr = jax.random.fold_in(key, jax.lax.axis_index('rays'))

            def loss_of(opt_p):
                blocked = {**opt_p, 'grids': to_blocked(opt_p['grids'])}
                return loss_fn(blocked, frozen_dec, colors, depths, kr)

            loss, grads = jax.value_and_grad(loss_of)(opt_p)
            # grid grads are slab-local and exact after psum('rays');
            # cam/dec grads are block-replicated (identical compute), so a
            # 'rays' reduction completes them too.
            return (jax.lax.psum(loss, 'rays'),
                    jax.tree_util.tree_map(
                        lambda g: jax.lax.psum(g, 'rays'), grads))

        return jax.shard_map(
            local, mesh=mesh,
            in_specs=({'cams': P(), 'grids': P('block'), 'dec': P()},
                      P(), P(), P(), P()),
            out_specs=(P(),
                       {'cams': P(), 'grids': P('block'), 'dec': P()}),
            check_vma=False)

    grad_fns = [blocked_grad(f) for f in loss_fns]

    def map_step(opt_params, frozen_dec, masks, lr_tab, stage_idx, cam_mask,
                 colors, depths, key, opt_state=None):
        return scan_map_iters(grad_fns, True, n_iters, opt_params,
                              frozen_dec, masks, lr_tab, stage_idx,
                              cam_mask, colors, depths, key, opt_state)

    return jax.jit(map_step)


def make_block_mesh(n_block: int, n_rays: int | None = None,
                    devices: list | None = None) -> jax.sharding.Mesh:
    """A ('block', 'rays') mesh.  With n_rays=None, uses all remaining
    devices on the rays axis."""
    if devices is None:
        devices = jax.devices()
    if n_rays is None:
        n_rays = len(devices) // n_block
    devs = np.asarray(devices[:n_block * n_rays]).reshape(n_block, n_rays)
    return jax.sharding.Mesh(devs, ('block', 'rays'))
