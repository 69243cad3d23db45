"""Alpha compositing: closed-form cases + parity with an independent numpy
implementation of the reference math (common.py:215-256)."""

import jax.numpy as jnp
import numpy as np

from nice_slam_tpu.core.composite import composite_rays


def numpy_composite(raw, z_vals, rays_d, occupancy):
    dists = np.diff(z_vals, axis=-1)
    dists = np.concatenate([dists, np.full_like(dists[..., :1], 1e10)], -1)
    dists = dists * np.linalg.norm(rays_d, axis=-1, keepdims=True)
    if occupancy:
        alpha = 1 / (1 + np.exp(-10 * raw[..., 3]))
    else:
        alpha = 1 - np.exp(-np.maximum(raw[..., 3], 0) * dists)
    ones = np.ones_like(alpha[..., :1])
    trans = np.cumprod(np.concatenate([ones, 1 - alpha + 1e-10], -1),
                       -1)[..., :-1]
    w = alpha * trans
    rgb = (w[..., None] * raw[..., :3]).sum(-2)
    depth = (w * z_vals).sum(-1)
    var = (w * (z_vals - depth[..., None]) ** 2).sum(-1)
    return depth, var, rgb, w


def test_matches_numpy_occupancy():
    rng = np.random.default_rng(0)
    raw = rng.normal(size=(16, 48, 4)).astype(np.float32)
    z = np.sort(rng.uniform(0.1, 5.0, size=(16, 48)), -1).astype(np.float32)
    d = rng.normal(size=(16, 3)).astype(np.float32)
    for occ in [True, False]:
        got = composite_rays(jnp.asarray(raw), jnp.asarray(z),
                             jnp.asarray(d), occupancy=occ)
        want = numpy_composite(raw, z, d, occ)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), w, rtol=2e-4,
                                       atol=2e-5)


def test_opaque_surface_depth():
    """A single huge-occupancy sample should pin depth to that sample."""
    z = jnp.linspace(1.0, 3.0, 48)[None, :]
    raw = jnp.zeros((1, 48, 4)).at[:, :, 3].set(-100.0)
    raw = raw.at[0, 20, 3].set(100.0)  # opaque at z=z[20]
    rays_d = jnp.array([[0.0, 0.0, -1.0]])
    depth, var, rgb, w = composite_rays(raw, z, rays_d, occupancy=True)
    np.testing.assert_allclose(float(depth[0]), float(z[0, 20]), atol=1e-4)
    np.testing.assert_allclose(float(var[0]), 0.0, atol=1e-5)
    np.testing.assert_allclose(float(w[0, 20]), 1.0, atol=1e-5)


def test_empty_space_zero_weight():
    z = jnp.linspace(0.1, 4.0, 32)[None, :]
    raw = jnp.zeros((1, 32, 4)).at[:, :, 3].set(-50.0)
    rays_d = jnp.array([[0.0, 0.0, -1.0]])
    depth, var, rgb, w = composite_rays(raw, z, rays_d, occupancy=True)
    assert float(jnp.sum(w)) < 1e-4
    assert float(depth[0]) < 1e-3


def test_saturated_ray_gradients_finite_under_jit():
    """Several consecutive saturated (alpha=1) samples underflow the
    transmittance to 0; gradients must stay finite in the compiled program.
    Regression test for the NaN the log-space formulation produced under XLA
    fusion (and naive sigmoid overflow before that)."""
    import jax

    occ = jnp.array([[-40.0] * 19 + [100.0] * 5, [100.0] * 24])
    z = jnp.broadcast_to(jnp.linspace(0.02, 2.1, 24), (2, 24))
    rays_d = jnp.ones((2, 3))

    def loss(o):
        raw = jnp.concatenate(
            [jnp.zeros(o.shape + (3,)), o[..., None]], axis=-1)
        depth, var, rgb, w = composite_rays(raw, z, rays_d, occupancy=True)
        return jnp.sum(depth) + jnp.sum(w) + jnp.sum(var)

    g = jax.jit(jax.grad(loss))(occ)
    assert bool(jnp.isfinite(g).all()), g
