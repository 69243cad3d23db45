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

from nice_slam_tpu.core.cameras import Intrinsics
from nice_slam_tpu.engine.mapper import (
    MapperConfig, build_stage_losses, scan_map_iters)
from nice_slam_tpu.engine.tracker import TrackerConfig, tracking_loss
from nice_slam_tpu.render.renderer import RenderConfig, SceneModel, eval_raw
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


def make_sharded_track_frame(*, mesh: jax.sharding.Mesh, model: SceneModel,
                             rcfg: RenderConfig, tcfg: TrackerConfig,
                             intr: Intrinsics):
    """Multi-chip variant of engine.tracker.make_track_frame: each chip
    renders tcfg.pixels // n_devices rays; gradients psum over ICI."""
    n_dev = mesh.devices.size
    local_tcfg = tcfg._replace(pixels=max(tcfg.pixels // n_dev, 1))

    if tcfg.separate_lr:
        lr_vec = jnp.concatenate([jnp.full((4,), tcfg.cam_lr * 0.2),
                                  jnp.full((3,), tcfg.cam_lr)])
    else:
        lr_vec = jnp.full((7,), tcfg.cam_lr)

    def local(cam7, params, grids, gt_color, gt_depth, key):
        me = jax.lax.axis_index('rays')
        k = jax.random.fold_in(key, me)
        loss, g = jax.value_and_grad(tracking_loss)(
            cam7, params, grids, gt_color, gt_depth, k, model=model,
            rcfg=rcfg, tcfg=local_tcfg, intr=intr)
        return jax.lax.psum(loss, 'rays'), jax.lax.psum(g, 'rays')

    sharded = jax.shard_map(
        local, mesh=mesh, in_specs=(P(),) * 6, out_specs=(P(), P()),
        check_vma=False)

    def track_frame(params, grids, gt_color, gt_depth, cam7_init, key):
        def body(carry, it):
            cam7, opt_state, best_loss, best_cam7 = carry
            k = jax.random.fold_in(key, it)
            loss, g = sharded(cam7, params, grids, gt_color, gt_depth, k)
            cam7_new, opt_state = adam_update(cam7, g, opt_state, lr_vec)
            better = loss < best_loss
            best_loss = jnp.where(better, loss, best_loss)
            best_cam7 = jnp.where(better, cam7_new, best_cam7)
            return (cam7_new, opt_state, best_loss, best_cam7), loss

        init = (cam7_init, adam_init(cam7_init), jnp.inf, cam7_init)
        (cam7, _, _, best_cam7), losses = jax.lax.scan(
            body, init, jnp.arange(tcfg.iters))
        return best_cam7, cam7, losses

    return jax.jit(track_frame)


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
