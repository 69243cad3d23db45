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


# ---------------------------------------------------------------------------
# chunked variants (planes larger than VMEM split along y; halo = one
# H-line-aligned block, H = _align_lines(nz) so Mosaic's sublane-extent
# divisibility holds on real TPU).  Cases cover: by dividing ny, by not
# dividing ny (zero-padding path), by == 1 (nz % 8 == 0), single padded
# chunk (h > ny), and the TUM fr1/desk fine-grid shape that triggered the
# round-2 Mosaic block-shape rejection (nz = 38 -> H = 4, by = 20).
# ---------------------------------------------------------------------------

from nice_slam_tpu.ops.pallas.expand import (
    _expand_call_chunked, _fold_call_chunked)

_CHUNK_CASES = [((4, 6, 3), 8), ((4, 7, 8), 3), ((3, 5, 4), 2),
                ((3, 5, 8), 1), ((3, 9, 4), 4), ((5, 38, 38), 20)]


@pytest.mark.parametrize('shape,by', _CHUNK_CASES)
def test_expand_chunked_matches_xla(shape, by):
    nx, ny, nz = shape
    m = nx * ny * nz
    g = jnp.asarray(np.random.default_rng(3).normal(
        size=(m, 8)).astype(np.float32))
    ref = expand_grid_xla(g, shape).e
    out = _expand_call_chunked(g, shape, True, by)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.parametrize('shape,by', _CHUNK_CASES)
def test_fold_chunked_matches_xla_transpose(shape, by):
    nx, ny, nz = shape
    m = nx * ny * nz
    rng = np.random.default_rng(4)
    g = jnp.asarray(rng.normal(size=(m, 8)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(m, 64)).astype(np.float32))

    def loss_ref(g):
        return jnp.vdot(expand_grid_xla(g, shape).e, cot)

    want = jax.grad(loss_ref)(g)
    got = _fold_call_chunked(cot, shape, True, by)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_vmem_dispatch_uses_chunked_path(monkeypatch):
    """Shrinking the VMEM budget must route expand_grid_pallas through the
    chunked kernels with identical values and gradients."""
    import nice_slam_tpu.ops.pallas.expand as E
    shape = (3, 6, 4)
    m = shape[0] * shape[1] * shape[2]
    rng = np.random.default_rng(5)
    g = jnp.asarray(rng.normal(size=(m, 8)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(m, 64)).astype(np.float32))
    ref = expand_grid_xla(g, shape).e
    want_grad = jax.grad(
        lambda g: jnp.vdot(expand_grid_xla(g, shape).e, cot))(g)

    monkeypatch.setattr(E, '_VMEM_LIMIT_BYTES',
                        E._chunk_bytes(2, shape[2], 8))
    assert E.pallas_expand_ok(shape, 8)
    # spy: BOTH directions must actually take the chunked kernels (the
    # backward fold is the mapping hot path the chunking exists for)
    calls = []
    real_e, real_f = E._expand_call_chunked, E._fold_call_chunked
    monkeypatch.setattr(E, '_expand_call_chunked',
                        lambda *a: calls.append('e') or real_e(*a))
    monkeypatch.setattr(E, '_fold_call_chunked',
                        lambda *a: calls.append('f') or real_f(*a))
    out = E.expand_grid_pallas(g, shape, True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    got_grad = jax.grad(
        lambda g: jnp.vdot(E.expand_grid_pallas(g, shape, True), cot))(g)
    np.testing.assert_allclose(np.asarray(got_grad), np.asarray(want_grad),
                               atol=1e-5, rtol=1e-5)
    assert 'e' in calls and 'f' in calls, calls
