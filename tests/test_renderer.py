"""Renderer-level tests: importance-resample merge path, grad_z default."""

import jax
import jax.numpy as jnp
import numpy as np

from nice_slam_tpu.core.composite import composite_rays
from nice_slam_tpu.core.sampling import sample_pdf
from nice_slam_tpu.models.decoders import DecoderConfig, init_imap_decoder
from nice_slam_tpu.render.renderer import (
    RenderConfig, SceneModel, eval_raw, render_rays)


def _imap_setup(n_importance):
    dcfg = DecoderConfig(pos_embedding_method='nerf', imap_hidden=32,
                         imap_blocks=2)
    bound = jnp.asarray([[-2.0, 2.0], [-2.0, 2.0], [-2.0, 2.0]])
    model = SceneModel(kind='imap', decoder=dcfg, bound=bound)
    rcfg = RenderConfig(n_samples=12, n_surface=6, n_importance=n_importance,
                        occupancy=False, perturb=0.0)
    params = init_imap_decoder(jax.random.PRNGKey(0), dcfg)
    key = jax.random.PRNGKey(1)
    n = 16
    rays_o = jnp.zeros((n, 3)) + jnp.asarray([0.0, 0.0, 1.5])
    d = jax.random.normal(key, (n, 3)) * 0.1 + jnp.asarray([0.0, 0.0, -1.0])
    rays_d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    gt_depth = jnp.full((n,), 1.2)
    return params, model, rcfg, rays_o, rays_d, gt_depth


def _render_full_redecode(params, model, rcfg, rays_o, rays_d, gt_depth, key):
    """The reference's importance path: re-decode ALL s + n_imp points
    (Renderer.py:244-259).  Used as the golden result for the merged path."""
    from nice_slam_tpu.render.renderer import _z_values
    k_strat, k_imp = jax.random.split(key)
    z_vals = _z_values(k_strat, rcfg, rays_o, rays_d, gt_depth, model.bound,
                       'color')
    pts = rays_o[..., None, :] + rays_d[..., None, :] * z_vals[..., :, None]
    n_rays, s = z_vals.shape
    raw = eval_raw(params, None, pts.reshape(-1, 3), 'color', model)
    raw = raw.reshape(n_rays, s, 4)
    _, _, _, weights = composite_rays(raw, z_vals, rays_d,
                                      occupancy=rcfg.occupancy)
    z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    z_samples = sample_pdf(k_imp, z_mid, weights[..., 1:-1],
                           rcfg.n_importance, det=True)
    z_samples = jax.lax.stop_gradient(z_samples)
    z_vals = jnp.sort(jnp.concatenate([z_vals, z_samples], axis=-1), axis=-1)
    pts = rays_o[..., None, :] + rays_d[..., None, :] * z_vals[..., :, None]
    raw = eval_raw(params, None, pts.reshape(-1, 3), 'color', model)
    raw = raw.reshape(n_rays, s + rcfg.n_importance, 4)
    return composite_rays(raw, z_vals, rays_d, occupancy=rcfg.occupancy)


def test_importance_merge_matches_full_redecode():
    """render_rays' decode-new-points-only importance path must equal the
    reference's full re-decode bit-for-bit (pure decoder => same values)."""
    params, model, rcfg, rays_o, rays_d, gt_depth = _imap_setup(8)
    key = jax.random.PRNGKey(7)
    got = render_rays(params, None, rays_o, rays_d, stage='color',
                      model=model, rcfg=rcfg, gt_depth=gt_depth, key=key)
    want = _render_full_redecode(params, model, rcfg, rays_o, rays_d,
                                 gt_depth, key)
    for g, w in zip(got[:3], want[:3]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-5, atol=1e-5)


def test_importance_merge_gradients_flow():
    params, model, rcfg, rays_o, rays_d, gt_depth = _imap_setup(8)

    def loss(p):
        depth, _, color, _ = render_rays(
            p, None, rays_o, rays_d, stage='color', model=model, rcfg=rcfg,
            gt_depth=gt_depth, key=jax.random.PRNGKey(3))
        return jnp.sum(jnp.abs(depth - gt_depth)) + jnp.sum(jnp.abs(color))

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_grad_z_defaults_to_reference_semantics():
    """grad_z must default False = the reference's detached bbox exit
    (Renderer.py:141-146)."""
    from nice_slam_tpu.utils.config import render_config_from_cfg
    from tests.util import make_test_cfg
    assert RenderConfig().grad_z is False
    rcfg = render_config_from_cfg(make_test_cfg())
    assert rcfg.grad_z is False
