"""Camera tracking engine (L3).

Functional parity target: /root/reference/src/Tracker.py.
  * one Adam iteration (:78-135): sample pixels away from the image edge,
    render at the current pose, depth loss |d_gt - d|/sqrt(var) with the
    dynamic-pixel rejection (residual < 10x median) plus a weighted color
    term, step on a 7-vector [quat, t] camera tensor.
  * the per-frame loop (:151-299): constant-speed motion model, optional
    split rotation/translation learning rates (rotation at 0.2x lr), and
    the min-loss candidate pose kept across iterations.

TPU design: the whole per-frame optimization (`iters` Adam steps) is ONE
compiled program — a `lax.scan` whose body does sample -> render -> grad ->
Adam update.  A fresh Adam state per frame reproduces the reference's
fresh-optimizer-per-frame behavior.  The reference's ray prefilter (drop
rays whose bbox exit is closer than the sensor depth, :100-111) becomes a
zero-weight mask so shapes stay static; sums are unchanged.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from nice_slam_tpu.core.cameras import Intrinsics, c2w_from_tensor, rays_from_uv
from nice_slam_tpu.core.sampling import (
    gather_pixels, masked_median, ray_bound_exit, sample_pixels)
from nice_slam_tpu.render.renderer import RenderConfig, SceneModel, render_rays
from nice_slam_tpu.utils.optim import adam_init, adam_update


class TrackerConfig(NamedTuple):
    """Static tracking hyperparameters (config `tracking.*`,
    configs/nice_slam.yaml:34-50)."""

    pixels: int = 200
    iters: int = 10
    cam_lr: float = 0.001
    separate_lr: bool = False
    w_color_loss: float = 0.5
    use_color: bool = True
    ignore_edge_w: int = 20
    ignore_edge_h: int = 20
    handle_dynamic: bool = True
    const_speed: bool = True
    # Floor for the depth-variance weighting denominator.  The reference
    # uses a bare 1e-10 epsilon (Tracker.py:119,125); with smooth pretrained
    # decoders the rendered variance stays ~1e-4 so this never binds.  From-
    # scratch decoders can fit near-step occupancy transitions, collapsing
    # the variance to ~1e-15 and amplifying map noise ~1e5x over the pose
    # signal — a floor restores the reference's effective weighting scale.
    var_floor: float = 1e-10


def tracking_loss(cam7: jnp.ndarray, params: Any, grids: Any,
                  gt_color: jnp.ndarray, gt_depth: jnp.ndarray,
                  key: jax.Array, *, model: SceneModel, rcfg: RenderConfig,
                  tcfg: TrackerConfig, intr: Intrinsics) -> jnp.ndarray:
    """One tracking forward pass -> scalar loss (Tracker.py:78-131)."""
    i, j = sample_pixels(key, tcfg.pixels,
                         tcfg.ignore_edge_h, intr.H - tcfg.ignore_edge_h,
                         tcfg.ignore_edge_w, intr.W - tcfg.ignore_edge_w)
    c2w = c2w_from_tensor(cam7)
    rays_o, rays_d = rays_from_uv(i, j, c2w, intr)
    d_gt = gather_pixels(gt_depth, i, j)
    c_gt = gather_pixels(gt_color, i, j)

    if model.kind == 'nice':
        # bbox prefilter (Tracker.py:100-111) as a weight mask
        t_exit = ray_bound_exit(jax.lax.stop_gradient(rays_o),
                                jax.lax.stop_gradient(rays_d), model.bound)
        inside = t_exit >= d_gt
    else:
        inside = jnp.ones_like(d_gt, dtype=bool)

    # Zero the depth of masked-out rays so batch statistics inside the
    # renderer (max-depth far clip, zero-depth surface sweep) see exactly
    # the reference's *filtered* batch; the rays themselves are loss-masked.
    d_render = jnp.where(inside, d_gt, 0.0)
    depth, var, color, _ = render_rays(
        params, grids, rays_o, rays_d, stage='color', model=model,
        rcfg=rcfg, gt_depth=d_render, key=key)
    var = jax.lax.stop_gradient(var)

    tmp = jnp.abs(d_gt - depth) / jnp.sqrt(var + tcfg.var_floor)
    if tcfg.handle_dynamic:
        med = masked_median(jax.lax.stop_gradient(tmp), inside)
        mask = (tmp < 10.0 * med) & (d_gt > 0) & inside
    else:
        mask = (d_gt > 0) & inside
    mask = jax.lax.stop_gradient(mask)

    loss = jnp.sum(jnp.where(mask, tmp, 0.0))
    if tcfg.use_color:
        color_l = jnp.sum(jnp.where(mask[:, None],
                                    jnp.abs(c_gt - color), 0.0))
        loss = loss + tcfg.w_color_loss * color_l
    return loss


def make_track_frame(*, model: SceneModel, rcfg: RenderConfig,
                     tcfg: TrackerConfig, intr: Intrinsics, salt: int = 0):
    """Build the jitted per-frame tracking program.

    Returns a function (params, grids, gt_color, gt_depth, cam7_init, key)
    -> (best_cam7, last_cam7, losses[iters]) compiled once per shape set.

    salt: mathematically inert constant baked into the program (folded to
    +0.0 by XLA) that changes the pre-optimization HLO, and with it the
    compilation-cache key.  XLA's TPU compile quality is nondeterministic
    on this program (identical HLO has produced both ~9 ms and ~50 ms
    binaries — buffer-layout assignment); the orchestrator times the
    compiled program and re-rolls with salt+1 when it drew a slow binary
    (engine/slam.py)."""
    if tcfg.separate_lr:
        lr_vec = jnp.concatenate([
            jnp.full((4,), tcfg.cam_lr * 0.2),  # rotation at 0.2x lr
            jnp.full((3,), tcfg.cam_lr)])
    else:
        lr_vec = jnp.full((7,), tcfg.cam_lr)

    loss_grad = jax.value_and_grad(tracking_loss)

    def track_frame(params, grids, gt_color, gt_depth, cam7_init, key):
        # INSIDE the trace, so the salt constant lands in the
        # pre-optimization HLO (a build-time `lr_vec + salt*0.0` folds
        # eagerly to the same array and would hash to the same
        # compilation-cache key — no re-roll at all)
        lr = lr_vec + jnp.float32(salt) * 0.0
        if model.kind == 'nice' and model.expanded:
            # grids are constant across the frame's scan: corner-expand once
            # so each render pays one gathered row per sample point.  The
            # orchestrator passes already-expanded grids (they change only
            # when a mapping call lands, every `every_frame` frames), making
            # this a no-op there.
            from nice_slam_tpu.models.grids import prepare_grids
            grids = prepare_grids(grids, model.grid_shapes, stage='color')

        def body(carry, it):
            cam7, opt_state, best_loss, best_cam7 = carry
            k = jax.random.fold_in(key, it)
            loss, g = loss_grad(cam7, params, grids, gt_color, gt_depth, k,
                                model=model, rcfg=rcfg, tcfg=tcfg, intr=intr)
            cam7_new, opt_state = adam_update(cam7, g, opt_state, lr)
            # The reference records the *post-step* tensor keyed by the
            # pre-step loss (Tracker.py:264-283).
            better = loss < best_loss
            best_loss = jnp.where(better, loss, best_loss)
            best_cam7 = jnp.where(better, cam7_new, best_cam7)
            return (cam7_new, opt_state, best_loss, best_cam7), loss

        init = (cam7_init, adam_init(cam7_init), jnp.inf, cam7_init)
        (cam7, _, _, best_cam7), losses = jax.lax.scan(
            body, init, jnp.arange(tcfg.iters))
        return best_cam7, cam7, losses

    return jax.jit(track_frame)


def const_speed_init(pre_c2w: jnp.ndarray, pre_pre_c2w: jnp.ndarray
                     ) -> jnp.ndarray:
    """Constant-speed motion model: apply the last relative motion again
    (Tracker.py:212-219).  Both inputs are 4x4."""
    delta = pre_c2w @ jnp.linalg.inv(pre_pre_c2w)
    return delta @ pre_c2w
