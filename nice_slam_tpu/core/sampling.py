"""Pixel, depth-along-ray, and importance sampling (L0).

Functional parity targets:
  * uniform pixel draw:        /root/reference/src/common.py:92-134
  * near/far from bbox+depth:  /root/reference/src/utils/Renderer.py:125-159
  * stratified + surface z:    /root/reference/src/utils/Renderer.py:162-224
  * hierarchical (pdf) resample: /root/reference/src/common.py:19-63

TPU-first deviations from the reference (semantics preserved):
  * Randomness is `jax.random` with explicit keys (counter-based Threefry),
    so every step is reproducible and shardable (fold the device index into
    the key for ray-parallel execution).
  * The reference drops rays that exit the scene bound before the sensor
    depth (Tracker.py:100-111).  Dynamic shapes don't compile, so we keep a
    static ray count and return a validity mask; losses zero-weight instead
    of filtering — identical sums.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_pixels(key: jax.Array, n: int, h0: int, h1: int, w0: int, w1: int
                  ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Draw n uniform pixel coordinates from the rect [h0,h1) x [w0,w1).

    Matches the reference's `randint` over the flattened crop
    (common.py:92-122): i is the column (x), j the row (y), both float32.
    """
    kh, kw = jax.random.split(key)
    j = jax.random.randint(kh, (n,), h0, h1).astype(jnp.float32)
    i = jax.random.randint(kw, (n,), w0, w1).astype(jnp.float32)
    return i, j


def gather_pixels(image: jnp.ndarray, i: jnp.ndarray, j: jnp.ndarray
                  ) -> jnp.ndarray:
    """Gather per-pixel values at integer coordinates (i=x/col, j=y/row)."""
    jj = j.astype(jnp.int32)
    ii = i.astype(jnp.int32)
    return image[jj, ii]


def ray_bound_exit(rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                   bound: jnp.ndarray) -> jnp.ndarray:
    """Distance along each ray to its exit from the axis-aligned scene bound.

    Reference computes t = (bound - o)/d, takes max over the two faces per
    axis then min over axes (Renderer.py:144-152, Tracker.py:103-107).

    Args:
      rays_o, rays_d: [N, 3].
      bound: [3, 2] scene bound (min, max per axis).
    Returns:
      [N] exit distance.
    """
    t = (bound[None, :, :] - rays_o[..., None]) / rays_d[..., None]
    return jnp.min(jnp.max(t, axis=2), axis=1)


def stratified_z_vals(n_samples: int, near: jnp.ndarray, far: jnp.ndarray,
                      *, lindisp: bool = False, perturb: float = 0.0,
                      key: jax.Array | None = None,
                      ray_keys: jax.Array | None = None) -> jnp.ndarray:
    """Evenly spaced samples in [near, far] (optionally jittered).

    near/far broadcast against [N_rays, 1] (reference Renderer.py:203-219).
    `ray_keys` ([N_rays] key array) draws the jitter with one independent
    stream PER RAY instead of one batch draw from `key` — the draw is then
    invariant to how the ray batch is split across devices (the
    keyframe-sharded mapper derives ray keys from globally indexed
    per-frame streams; parallel/distributed.py).
    Returns [N_rays, n_samples].
    """
    t_vals = jnp.linspace(0.0, 1.0, n_samples)
    if not lindisp:
        z_vals = near * (1.0 - t_vals) + far * t_vals
    else:
        z_vals = 1.0 / (1.0 / near * (1.0 - t_vals) + 1.0 / far * t_vals)
    if perturb > 0.0:
        assert key is not None or ray_keys is not None, \
            "perturb>0 requires a PRNG key"
        mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
        lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
        if ray_keys is not None:
            t_rand = jax.vmap(
                lambda k: jax.random.uniform(k, (n_samples,)))(ray_keys)
        else:
            t_rand = jax.random.uniform(key, z_vals.shape)
        z_vals = lower + (upper - lower) * t_rand
    return z_vals


def surface_z_vals(n_surface: int, gt_depth: jnp.ndarray,
                   d_max: jnp.ndarray | None = None) -> jnp.ndarray:
    """Near-surface samples: [0.95 d, 1.05 d] for pixels with depth, and a
    uniform sweep [0.001, max(depth)] for depth-zero pixels
    (reference Renderer.py:171-200, exactly the non-naive branch).

    Args:
      gt_depth: [N_rays] sensor depth (0 where invalid).
      d_max: batch depth maximum override — the reference takes the max
        over the WHOLE ray batch, so sharded callers pass the global
        (psum-max) value to stay draw-identical.
    Returns:
      [N_rays, n_surface].
    """
    t_vals = jnp.linspace(0.0, 1.0, n_surface)
    d = gt_depth[..., None]
    z_surf = 0.95 * d * (1.0 - t_vals) + 1.05 * d * t_vals
    far_zero = jnp.max(gt_depth) if d_max is None else d_max
    z_zero = 0.001 * (1.0 - t_vals) + far_zero * t_vals
    has_depth = (gt_depth > 0.0)[..., None]
    return jnp.where(has_depth, z_surf, z_zero[None, :])


def near_far_from_depth(rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                        bound: jnp.ndarray, gt_depth: jnp.ndarray | None,
                        grad_z: bool = False,
                        d_max: jnp.ndarray | None = None):
    """near/far per ray following Renderer.py:125-159.

    With sensor depth: near = 0.01*d per ray, far = clamp(bbox exit + 0.01,
    0, 1.2*max(d)).  Without: near = 0.01 scalar, far = bbox exit + 0.01.

    grad_z: the reference computes the bbox exit on DETACHED rays
    (Renderer.py:141-146), so no pose gradient flows through the z sampling
    locations there — only through the ray origin/direction.  The DEFAULT
    (False) reproduces those reference gradient semantics exactly.  Setting
    rendering.grad_z: true opts into an extra exact gradient term: moving
    the camera moves the sample depths, and pose optimization measurably
    benefits (synthetic fixture, 3 seeds: max per-frame error 0.7-1.2 cm
    with the term vs 1.1-2.0 cm detached).

    Returns:
      near: [N, 1], far: [N, 1].
    """
    if not grad_z:
        rays_o = jax.lax.stop_gradient(rays_o)
        rays_d = jax.lax.stop_gradient(rays_d)
    far_bb = ray_bound_exit(rays_o, rays_d, bound)[..., None] + 0.01
    if gt_depth is None:
        near = jnp.full_like(far_bb, 0.01)
        return near, far_bb
    d = gt_depth.reshape(-1, 1)
    near = d * 0.01
    # the far clamp uses the max over the WHOLE ray batch
    # (Renderer.py:137); sharded callers pass the global max as d_max
    far = jnp.clip(far_bb, 0.0,
                   (jnp.max(d) if d_max is None else d_max) * 1.2)
    return near, far


def sample_pdf(key: jax.Array, bins: jnp.ndarray, weights: jnp.ndarray,
               n_samples: int, det: bool = False,
               ray_keys: jax.Array | None = None) -> jnp.ndarray:
    """Inverse-CDF importance sampling (NeRF hierarchical sampling).

    Reference: common.py:19-63.  `bins` are the midpoints between existing
    z values; `weights` their compositing weights.

    Args:
      bins: [N_rays, M].
      weights: [N_rays, M-1] (interval weights).
      ray_keys: optional [N_rays] key array — per-ray draw streams (see
        stratified_z_vals), used instead of one batch draw from `key`.
    Returns:
      [N_rays, n_samples] new z samples (detached by construction —
      callers should not differentiate through this).
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)

    if det:
        u = jnp.linspace(0.0, 1.0, n_samples)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_samples,))
    elif ray_keys is not None:
        u = jax.vmap(
            lambda k: jax.random.uniform(k, (n_samples,)))(ray_keys)
    else:
        u = jax.random.uniform(key, cdf.shape[:-1] + (n_samples,))

    # searchsorted(side='right') = count of cdf entries <= u.  The bin count
    # is tiny (n_samples+n_surface+1 lanes), so an explicit comparison count
    # vectorizes on the VPU instead of vmapping a per-ray binary search
    # (measured 17 ms -> ~2 ms per iMAP mapping iteration at 5000 rays).
    inds = jnp.sum(cdf[..., :, None] <= u[..., None, :], axis=-2)
    below = jnp.maximum(0, inds - 1)
    above = jnp.minimum(cdf.shape[-1] - 1, inds)

    cdf_b = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_a = jnp.take_along_axis(cdf, above, axis=-1)
    bins_b = jnp.take_along_axis(bins, below, axis=-1)
    bins_a = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_a - cdf_b
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_b) / denom
    return bins_b + t * (bins_a - bins_b)


def masked_median(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Median of x restricted to mask, matching torch.median's lower-middle
    convention on the compacted array (used by the tracker's dynamic-pixel
    rejection, Tracker.py:118-120, where the reference filters first).

    Invalid entries are pushed to +inf; the median of k valid entries is the
    sorted element at index (k-1)//2.
    """
    big = jnp.where(mask, x, jnp.inf)
    srt = jnp.sort(big)
    k = jnp.sum(mask.astype(jnp.int32))
    idx = jnp.maximum(k - 1, 0) // 2
    return srt[idx]
