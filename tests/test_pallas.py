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


# ---------------------------------------------------------------------------
# corner-expansion kernel + its fold (transpose) vs the XLA formulation
# ---------------------------------------------------------------------------

from nice_slam_tpu.ops.pallas.expand import expand_grid_pallas
from nice_slam_tpu.ops.trilinear import expand_grid_xla


@pytest.mark.parametrize('shape', [(5, 4, 3), (1, 4, 3), (4, 1, 3),
                                   (4, 3, 1), (1, 1, 1), (2, 2, 2),
                                   (7, 5, 6)])
def test_expand_pallas_matches_xla(shape):
    nx, ny, nz = shape
    m = nx * ny * nz
    g = jnp.asarray(np.random.default_rng(1).normal(
        size=(m, 8)).astype(np.float32))
    ref = expand_grid_xla(g, shape).e
    out = expand_grid_pallas(g, shape, True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.parametrize('shape', [(5, 4, 3), (1, 4, 3), (4, 1, 3),
                                   (4, 3, 1), (2, 2, 2), (7, 5, 6)])
def test_expand_pallas_fold_matches_xla_grad(shape):
    nx, ny, nz = shape
    m = nx * ny * nz
    rng = np.random.default_rng(2)
    g = jnp.asarray(rng.normal(size=(m, 8)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(m, 64)).astype(np.float32))

    def loss_ref(g):
        return jnp.vdot(expand_grid_xla(g, shape).e, cot)

    def loss_pal(g):
        return jnp.vdot(expand_grid_pallas(g, shape, True), cot)

    g_ref = jax.grad(loss_ref)(g)
    g_pal = jax.grad(loss_pal)(g)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               atol=1e-5, rtol=1e-5)
