"""Pallas fused decoder kernel vs the pure-XLA reference (interpret mode on
CPU; the same kernel compiles with Mosaic on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nice_slam_tpu.models.decoders import (
    DecoderConfig, init_nice_decoders, mlp_apply)
from nice_slam_tpu.ops.pallas.fused_mlp import fused_mlp


@pytest.fixture(scope='module')
def setup():
    dcfg = DecoderConfig()
    params = init_nice_decoders(jax.random.PRNGKey(0), dcfg)
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.uniform(-1, 1, (1500, 3)).astype(np.float32))
    c = jnp.asarray(rng.normal(size=(1500, 32)).astype(np.float32))
    return dcfg, params, p, c


def test_fused_matches_reference_occ(setup):
    dcfg, params, p, c = setup
    ref = mlp_apply(params['middle'], dcfg, p, c, color=False)
    out = fused_mlp(params['middle'], dcfg, p, c, False, (2,), True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=1e-5)


def test_fused_matches_reference_color(setup):
    dcfg, params, p, c = setup
    ref = mlp_apply(params['color'], dcfg, p, c, color=True)
    out = fused_mlp(params['color'], dcfg, p, c, True, (2,), True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=1e-5)


def test_fused_gradients_match(setup):
    dcfg, params, p, c = setup

    def loss_ref(params, c):
        return jnp.sum(jnp.sin(mlp_apply(params, dcfg, p, c, color=False)))

    def loss_fused(params, c):
        return jnp.sum(jnp.sin(
            fused_mlp(params, dcfg, p, c, False, (2,), True)))

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(params['middle'], c)
    g_fus = jax.grad(loss_fused, argnums=(0, 1))(params['middle'], c)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fus)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4,
                                   rtol=2e-3)
