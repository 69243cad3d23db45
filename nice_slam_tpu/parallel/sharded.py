"""Ray-sharded (multi-chip) tracking, mapping, and field-query steps.

Design (SURVEY.md §2.3 / §5.7-5.8): every optimization step's loss is a SUM
over independently-rendered rays, so the exact multi-chip decomposition is

    each chip: draw its own ray subset (PRNG folded with axis_index)
               -> render -> local loss/grads
    psum(loss), psum(grads) over the 'rays' mesh axis (ICI collective)
    identical (replicated) Adam update on every chip

Grids/decoder parameters are replicated: at NICE-SLAM scale the four feature
volumes are 10-50 MB — far below HBM — so replicate-and-psum is the
bandwidth-optimal layout (gradient exchange is one all-reduce per iteration
riding ICI; no halo machinery needed).  Keyframe images are replicated for
the same reason.  This is semantically the reference's exact computation
with a different (parallel) pixel draw.

`sharded_eval_points` shards the mesher's lattice query over chips — the
256^3..512^3 occupancy evaluation is embarrassingly parallel over points.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from nice_slam_tpu.core.cameras import (
    Intrinsics, c2w_from_tensor, rays_from_uv)
from nice_slam_tpu.core.sampling import (
    gather_pixels, masked_median, ray_bound_exit, sample_pixels)
from nice_slam_tpu.engine.mapper import (
    MapperConfig, build_stage_losses, scan_map_iters)
from nice_slam_tpu.engine.tracker import TrackerConfig
from nice_slam_tpu.render.renderer import (
    RenderConfig, SceneModel, eval_raw, render_rays)
from nice_slam_tpu.utils.optim import adam_init, adam_update


def make_sharded_map_step(*, mesh: jax.sharding.Mesh, model: SceneModel,
                          rcfg: RenderConfig, mcfg: MapperConfig,
                          intr: Intrinsics, n_frames: int, n_iters: int,
                          pix_per_frame: int):
    """Multi-chip variant of engine.mapper.make_map_step.

    `pix_per_frame` is the GLOBAL per-frame pixel budget; each of the
    mesh's devices draws pix_per_frame // n_devices rays per frame.
    Signature matches make_map_step.
    """
    n_dev = mesh.devices.size
    local_pix = max(pix_per_frame // n_dev, 1)
    nice = model.kind == 'nice'

    _, loss_fns = build_stage_losses(
        model=model, rcfg=rcfg, mcfg=mcfg, intr=intr, n_frames=n_frames,
        pix_per_frame=local_pix)

    def sharded_grad(loss_fn):
        def local(opt_p, frozen_dec, colors, depths, key):
            me = jax.lax.axis_index('rays')
            k = jax.random.fold_in(key, me)
            loss, grads = jax.value_and_grad(loss_fn)(
                opt_p, frozen_dec, colors, depths, k)
            return (jax.lax.psum(loss, 'rays'),
                    jax.lax.psum(grads, 'rays'))

        return jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(), P(), P(), P()),
            out_specs=(P(), P()), check_vma=False)

    grad_fns = [sharded_grad(f) for f in loss_fns]

    def map_step(opt_params, frozen_dec, masks, lr_tab, stage_idx, cam_mask,
                 colors, depths, key, opt_state=None):
        return scan_map_iters(grad_fns, nice, n_iters, opt_params,
                              frozen_dec, masks, lr_tab, stage_idx,
                              cam_mask, colors, depths, key, opt_state)

    return jax.jit(map_step)


def sharded_tracking_loss(cam7: jnp.ndarray, params: Any, grids: Any,
                          gt_color: jnp.ndarray, gt_depth: jnp.ndarray,
                          key: jax.Array, *, model: SceneModel,
                          rcfg: RenderConfig, tcfg: TrackerConfig,
                          intr: Intrinsics, axis: str = 'rays',
                          n_dev: int = 1) -> jnp.ndarray:
    """Per-device slice of engine.tracker.tracking_loss, DRAW-IDENTICAL to
    the single-device program (runs inside shard_map over `axis`).

    Every device draws the IDENTICAL global pixel batch from the global
    key (the draw is a few thousand ints — replicating it is free), then
    renders only its contiguous 1/n_dev slice.  The two batch-global
    statistics the reference's loss needs (Tracker.py:78-131) are
    reconstructed exactly:
      * the far-clip depth maximum (Renderer.py:155-159's 1.2*max(d)) is
        computed from the replicated full batch and passed via the
        renderer's `d_max` override;
      * the dynamic-pixel median (Tracker.py:118-120) is taken over an
        all_gather of the per-ray residuals — stop-gradient, [pixels]
        floats, one tiled ICI gather per iteration.
    The LOCAL masked loss sum is returned; callers psum it (and its
    grads), which reproduces the single-device sums up to float
    reduction order.  With rendering.perturb == 0 (every shipped NICE and
    iMAP config) the render itself is deterministic, so the sharded loss
    is draw-identical, not just distribution-equivalent; with perturb > 0
    the z-jitter switches to per-ray key streams (`ray_keys`, folded from
    the global ray index) — shard-count-invariant, but a different stream
    than the single-device batch draw.
    """
    i, j = sample_pixels(key, tcfg.pixels,
                         tcfg.ignore_edge_h, intr.H - tcfg.ignore_edge_h,
                         tcfg.ignore_edge_w, intr.W - tcfg.ignore_edge_w)
    c2w = c2w_from_tensor(cam7)
    rays_o, rays_d = rays_from_uv(i, j, c2w, intr)
    d_gt = gather_pixels(gt_depth, i, j)
    c_gt = gather_pixels(gt_color, i, j)

    if model.kind == 'nice':
        t_exit = ray_bound_exit(jax.lax.stop_gradient(rays_o),
                                jax.lax.stop_gradient(rays_d), model.bound)
        inside = t_exit >= d_gt
    else:
        inside = jnp.ones_like(d_gt, dtype=bool)
    d_render = jnp.where(inside, d_gt, 0.0)
    d_max = jnp.max(d_render)          # GLOBAL batch far-clip statistic

    local = tcfg.pixels // n_dev
    me = jax.lax.axis_index(axis)
    sl = partial(jax.lax.dynamic_slice_in_dim,
                 start_index=me * local, slice_size=local, axis=0)
    ray_keys = None
    if rcfg.perturb > 0:
        idx = me * local + jnp.arange(local)
        ray_keys = jax.vmap(lambda t: jax.random.fold_in(key, t))(idx)
    depth, var, color, _ = render_rays(
        params, grids, sl(rays_o), sl(rays_d), stage='color', model=model,
        rcfg=rcfg, gt_depth=sl(d_render), key=key, d_max=d_max,
        ray_keys=ray_keys)
    var = jax.lax.stop_gradient(var)

    d_gt_l, inside_l = sl(d_gt), sl(inside)
    tmp = jnp.abs(d_gt_l - depth) / jnp.sqrt(var + tcfg.var_floor)
    if tcfg.handle_dynamic:
        # tiled all_gather of contiguous slices restores global order
        tmp_all = jax.lax.all_gather(jax.lax.stop_gradient(tmp), axis,
                                     tiled=True)
        med = masked_median(tmp_all, inside)
        mask = (tmp < 10.0 * med) & (d_gt_l > 0) & inside_l
    else:
        mask = (d_gt_l > 0) & inside_l
    mask = jax.lax.stop_gradient(mask)

    loss = jnp.sum(jnp.where(mask, tmp, 0.0))
    if tcfg.use_color:
        color_l = jnp.sum(jnp.where(mask[:, None],
                                    jnp.abs(sl(c_gt) - color), 0.0))
        loss = loss + tcfg.w_color_loss * color_l
    return loss


def make_sharded_track_frame(*, mesh: jax.sharding.Mesh, model: SceneModel,
                             rcfg: RenderConfig, tcfg: TrackerConfig,
                             intr: Intrinsics, salt: int = 0):
    """Multi-chip variant of engine.tracker.make_track_frame: each chip
    renders tcfg.pixels // n_devices rays; loss/gradients psum over ICI.

    Draw-identical to the single-device program (see
    `sharded_tracking_loss`); signature and salt semantics match
    make_track_frame so the orchestrator's autotune re-roll works
    unchanged.  Requires tracking.pixels divisible by the mesh size (every
    shipped budget — 200/1000/5000 px — divides 8).
    """
    n_dev = mesh.devices.size
    if tcfg.pixels % n_dev:
        raise ValueError(
            f'parallel.track: rays needs tracking.pixels ({tcfg.pixels}) '
            f'divisible by the mesh size ({n_dev})')

    if tcfg.separate_lr:
        lr_vec = jnp.concatenate([jnp.full((4,), tcfg.cam_lr * 0.2),
                                  jnp.full((3,), tcfg.cam_lr)])
    else:
        lr_vec = jnp.full((7,), tcfg.cam_lr)

    loss_grad = jax.value_and_grad(sharded_tracking_loss)

    def local(cam7, params, grids, gt_color, gt_depth, key):
        loss, g = loss_grad(cam7, params, grids, gt_color, gt_depth, key,
                            model=model, rcfg=rcfg, tcfg=tcfg, intr=intr,
                            n_dev=n_dev)
        return jax.lax.psum(loss, 'rays'), jax.lax.psum(g, 'rays')

    sharded = jax.shard_map(
        local, mesh=mesh, in_specs=(P(),) * 6, out_specs=(P(), P()),
        check_vma=False)

    def track_frame(params, grids, gt_color, gt_depth, cam7_init, key):
        lr = lr_vec + jnp.float32(salt) * 0.0   # compile re-roll salt
        if model.kind == 'nice' and model.expanded:
            # replicated corner-expansion, once per frame (the
            # orchestrator passes already-expanded grids — no-op there)
            from nice_slam_tpu.models.grids import prepare_grids
            grids = prepare_grids(grids, model.grid_shapes, stage='color')

        def body(carry, it):
            cam7, opt_state, best_loss, best_cam7 = carry
            k = jax.random.fold_in(key, it)
            loss, g = sharded(cam7, params, grids, gt_color, gt_depth, k)
            cam7_new, opt_state = adam_update(cam7, g, opt_state, lr)
            # post-step tensor keyed by the pre-step loss (Tracker.py:264)
            better = loss < best_loss
            best_loss = jnp.where(better, loss, best_loss)
            best_cam7 = jnp.where(better, cam7_new, best_cam7)
            return (cam7_new, opt_state, best_loss, best_cam7), loss

        init = (cam7_init, adam_init(cam7_init), jnp.inf, cam7_init)
        (cam7, _, _, best_cam7), losses = jax.lax.scan(
            body, init, jnp.arange(tcfg.iters))
        return best_cam7, cam7, losses

    return jax.jit(track_frame)


def replicate_to_mesh(x: Any, mesh: jax.sharding.Mesh) -> Any:
    """Replicate a pytree of (host or single-device) arrays onto every
    device of `mesh` (P() sharding).  Multi-process meshes go through
    make_array_from_process_local_data (each process feeds its identical
    host copy); single-process meshes are a plain device_put broadcast."""
    sh = jax.sharding.NamedSharding(mesh, P())
    import numpy as np

    if len(mesh.devices.flat) > len(jax.local_devices()) \
            or jax.process_count() > 1:
        return jax.tree.map(
            lambda a: jax.make_array_from_process_local_data(
                sh, np.asarray(a)), x)
    return jax.device_put(x, sh)


def sharded_eval_points(mesh: jax.sharding.Mesh, params: Any, grids: Any,
                        points: jnp.ndarray, stage: str, model: SceneModel
                        ) -> jnp.ndarray:
    """Shard a large point batch over chips and decode (mesher hot path).

    points: [N, 3] with N divisible by the mesh size (caller pads).
    Returns raw [N, 4].
    """
    def local(p):
        return eval_raw(params, grids, p, stage, model)

    fn = jax.shard_map(local, mesh=mesh, in_specs=P('rays'),
                       out_specs=P('rays'), check_vma=False)
    return fn(points)
