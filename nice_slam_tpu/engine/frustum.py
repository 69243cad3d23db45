"""Frustum feature selection: which grid cells does the current camera see?

Functional parity target: Mapper.get_mask_from_c2w
(/root/reference/src/Mapper.py:100-187):
  * project every grid node into the current depth image;
  * bilinear-sample the depth map at the projected uv (the reference uses
    cv2.remap INTER_LINEAR with zero border); zero samples are replaced by
    the maximum sampled depth;
  * keep nodes with 0 <= cam_depth <= sampled_depth + 0.5 that project
    inside the image, plus every node within 0.5 m of the camera center;
  * the coarse grid is always fully selected (:122-124).

Here the whole mask is computed on-device in one jitted program per grid
(the reference loops 30k-point chunks through OpenCV on the CPU).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from nice_slam_tpu.core.cameras import Intrinsics


def bilinear_sample_zero_border(img: jnp.ndarray, u: jnp.ndarray,
                                v: jnp.ndarray) -> jnp.ndarray:
    """Bilinear interpolation of img[H, W] at float (u=x, v=y) with zero
    padding outside — cv2.remap(INTER_LINEAR, BORDER_CONSTANT 0) semantics."""
    h, w = img.shape
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = u - u0
    fv = v - v0

    def tap(ui, vi):
        inb = (ui >= 0) & (ui <= w - 1) & (vi >= 0) & (vi <= h - 1)
        uc = jnp.clip(ui, 0, w - 1).astype(jnp.int32)
        vc = jnp.clip(vi, 0, h - 1).astype(jnp.int32)
        return jnp.where(inb, img[vc, uc], 0.0)

    t00 = tap(u0, v0)
    t01 = tap(u0 + 1, v0)
    t10 = tap(u0, v0 + 1)
    t11 = tap(u0 + 1, v0 + 1)
    top = t00 * (1 - fu) + t01 * fu
    bot = t10 * (1 - fu) + t11 * fu
    return top * (1 - fv) + bot * fv


@partial(jax.jit, static_argnames=('intr',))
def frustum_mask(points: jnp.ndarray, c2w: jnp.ndarray, depth: jnp.ndarray,
                 intr: Intrinsics) -> jnp.ndarray:
    """0/1 mask over grid nodes visible in the current frame.

    Args:
      points: [M, 3] world coordinates of grid nodes
        (models.grids.grid_world_coords, flattened).
      c2w: [4, 4] current camera pose.
      depth: [H, W] current sensor depth.
    Returns:
      [M] float32 mask.
    """
    w2c = jnp.linalg.inv(c2w)
    ones = jnp.ones_like(points[:, :1])
    cam = (jnp.concatenate([points, ones], axis=1) @ w2c.T)[:, :3]
    # the reference negates x before applying K (its K has +fx but the
    # OpenGL-style camera has x right / z backwards; u = fx * (-x)/z + cx
    # with z<0 in front gives u = fx * x/(-z) + cx)
    x = -cam[:, 0]
    y = cam[:, 1]
    z = cam[:, 2] + 1e-5
    u = (intr.fx * x + intr.cx * z) / z
    v = (intr.fy * y + intr.cy * z) / z

    sampled = bilinear_sample_zero_border(depth, u, v)
    max_depth = jnp.max(sampled)
    sampled = jnp.where(sampled == 0.0, max_depth, sampled)

    in_image = (u > 0) & (u < intr.W) & (v > 0) & (v < intr.H)
    cam_depth = -z  # camera looks along -z; positive depth in front
    seen = in_image & (cam_depth >= 0) & (cam_depth <= sampled + 0.5)

    near_cam = jnp.sum((points - c2w[:3, 3]) ** 2, axis=1) < 0.25
    return (seen | near_cam).astype(jnp.float32)
