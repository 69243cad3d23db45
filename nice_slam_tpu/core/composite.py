"""Alpha compositing of per-sample raw network outputs (L0).

Functional parity target: `raw2outputs_nerf_color`
(/root/reference/src/common.py:215-256).  Two modes:
  * occupancy=True  (NICE): alpha = sigmoid(10 * raw_occ)
  * occupancy=False (iMAP): alpha = 1 - exp(-relu(raw_occ) * dist)

TPU notes: the transmittance cumulative product runs over the (small, static)
sample axis; XLA turns `cumprod` into a log-depth scan that fuses with the
surrounding elementwise work, so this whole function is one fused kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def composite_rays(raw: jnp.ndarray, z_vals: jnp.ndarray, rays_d: jnp.ndarray,
                   occupancy: bool = True):
    """Composite raw [R, G, B, occ/sigma] samples into per-ray outputs.

    Args:
      raw: [N_rays, N_samples, 4] decoder output; last channel is occupancy
        logit (occupancy=True) or volume density (occupancy=False).
      z_vals: [N_rays, N_samples] sample depths along each ray.
      rays_d: [N_rays, 3] ray directions (length scales the step size).
      occupancy: choose the NICE occupancy or iMAP density model.

    Returns:
      depth:     [N_rays] expected termination depth.
      depth_var: [N_rays] depth variance ("uncertainty").
      rgb:       [N_rays, 3].
      weights:   [N_rays, N_samples] compositing weights.
    """
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1)
    dists = dists * jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    rgb = raw[..., :3]
    if occupancy:
        alpha = _sigmoid10(raw[..., 3])
    else:
        alpha = 1.0 - jnp.exp(-jnp.maximum(raw[..., 3], 0.0) * dists)

    # transmittance T_i = prod_{j<i} (1 - alpha_j + 1e-10).
    # Numerical-safety notes: cumprod's VJP divides by its inputs, which are
    # bounded below by the +1e-10, so gradients stay finite even when the
    # running product underflows to 0 across saturated samples.  (An
    # exp(cumsum(log .)) formulation is NOT safe here — XLA's fusion of that
    # backward emits NaNs on saturated rays; see tests/test_composite.py.)
    one_minus = 1.0 - alpha + 1e-10
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(alpha[..., :1]), one_minus],
                        axis=-1), axis=-1)[..., :-1]
    weights = alpha * trans

    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    resid = z_vals - depth_map[..., None]
    depth_var = jnp.sum(weights * resid * resid, axis=-1)
    return depth_map, depth_var, rgb_map, weights


def _sigmoid10(x: jnp.ndarray) -> jnp.ndarray:
    """NICE occupancy activation: sigmoid(10 x) (common.py:243-245).

    jax.nn.sigmoid, not 1/(1+exp(-10x)): the naive form overflows exp for
    strongly negative logits (carved-out free space reaches -40 after a few
    mapping iterations) and its VJP then emits inf/inf = NaN.
    """
    return jax.nn.sigmoid(10.0 * x)
