"""Numerical parity against the ACTUAL reference implementation.

These tests import the reference's torch modules (read-only, CPU) and
compare them against our JAX implementations on identical inputs and
identical weights.  They are the strongest correctness guarantee in the
suite: the decoder stack (grid interpolation + MLPs + stage dispatch) and
the compositing math must agree to float tolerance.

Skipped automatically when /root/reference is not present (e.g. on CI
machines without the mounted reference checkout).
"""

import os
import sys

import numpy as np
import pytest

REF = '/root/reference'
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, 'src')),
    reason='reference checkout not available')

if os.path.isdir(os.path.join(REF, 'src')):
    sys.path.insert(0, REF)


@pytest.fixture(scope='module')
def setup():
    import jax
    import jax.numpy as jnp
    import torch

    from nice_slam_tpu.models.decoders import (
        DecoderConfig, init_nice_decoders, mlp_apply, mlp_no_xyz_apply)
    from nice_slam_tpu.models.grids import (
        GridConfig, init_grids, static_grid_shapes)

    bound = ((-1.0, 1.4), (-0.8, 1.12), (-1.0, 1.4))
    gcfg = GridConfig(bound=bound)
    dcfg = DecoderConfig()
    key = jax.random.PRNGKey(7)
    kg, kd, kp = jax.random.split(key, 3)
    grids = init_grids(kg, gcfg)
    params = init_nice_decoders(kd, dcfg)
    shapes = dict(static_grid_shapes(gcfg))

    rng = np.random.default_rng(0)
    pts = rng.uniform(-0.9, 1.3, size=(500, 3)).astype(np.float32)

    # --- build the reference torch decoders and copy OUR weights in ---
    from src.conv_onet.models.decoder import MLP, MLP_no_xyz

    def to_torch_mlp(torch_mod, p):
        sd = {}
        for i, layer in enumerate(p['pts_linears']):
            sd[f'pts_linears.{i}.weight'] = torch.tensor(
                np.asarray(layer['w']).T)
            sd[f'pts_linears.{i}.bias'] = torch.tensor(
                np.asarray(layer['b']))
        if 'fc_c' in p:
            for i, layer in enumerate(p['fc_c']):
                sd[f'fc_c.{i}.weight'] = torch.tensor(
                    np.asarray(layer['w']).T)
                sd[f'fc_c.{i}.bias'] = torch.tensor(np.asarray(layer['b']))
        sd['output_linear.weight'] = torch.tensor(np.asarray(p['out']['w']).T)
        sd['output_linear.bias'] = torch.tensor(np.asarray(p['out']['b']))
        if 'embed_b' in p:
            sd['embedder._B'] = torch.tensor(np.asarray(p['embed_b']))
        torch_mod.load_state_dict(sd)
        return torch_mod

    t_middle = to_torch_mlp(
        MLP(name='middle', dim=3, c_dim=32, color=False, skips=[2],
            n_blocks=5, hidden_size=32, pos_embedding_method='fourier'),
        params['middle'])
    t_fine = to_torch_mlp(
        MLP(name='fine', dim=3, c_dim=64, color=False, skips=[2],
            n_blocks=5, hidden_size=32, concat_feature=True,
            pos_embedding_method='fourier'),
        params['fine'])
    t_color = to_torch_mlp(
        MLP(name='color', dim=3, c_dim=32, color=True, skips=[2],
            n_blocks=5, hidden_size=32, pos_embedding_method='fourier'),
        params['color'])
    t_coarse = to_torch_mlp(
        MLP_no_xyz(name='coarse', dim=3, c_dim=32, color=False,
                   hidden_size=32),
        params['coarse'])

    bound_t = __import__('torch').tensor(np.asarray(gcfg.bound_np))
    for mod in (t_middle, t_fine, t_color):
        mod.bound = bound_t
    t_coarse.bound = __import__('torch').tensor(
        np.asarray(gcfg.coarse_bound_np))

    # reference grid layout: [1, C, Nz, Ny, Nx] from our flat [M, C]
    def to_torch_grid(name):
        nx, ny, nz = shapes[name]
        g = np.asarray(grids[name]).reshape(nx, ny, nz, -1)
        return torch.tensor(np.ascontiguousarray(
            g.transpose(3, 2, 1, 0)))[None]

    c_grid = {f'grid_{n}': to_torch_grid(n)
              for n in ('coarse', 'middle', 'fine', 'color')}

    return dict(gcfg=gcfg, dcfg=dcfg, grids=grids, params=params,
                shapes=shapes, pts=pts, torch_dec=dict(
                    middle=t_middle, fine=t_fine, color=t_color,
                    coarse=t_coarse), c_grid=c_grid)


def _ours_raw(setup, stage):
    import jax.numpy as jnp
    from nice_slam_tpu.models.decoders import nice_eval
    from nice_slam_tpu.models.grids import static_grid_shapes
    s = setup
    return np.asarray(nice_eval(
        s['params'], s['grids'], jnp.asarray(s['pts']), stage, s['dcfg'],
        jnp.asarray(s['gcfg'].bound_np),
        jnp.asarray(s['gcfg'].coarse_bound_np),
        tuple(sorted(s['shapes'].items()))))


def test_middle_decoder_matches_reference(setup):
    import torch
    p = torch.tensor(setup['pts'])[None]
    with torch.no_grad():
        ref = setup['torch_dec']['middle'](p, setup['c_grid']).numpy()
    ours = _ours_raw(setup, 'middle')[:, 3]
    np.testing.assert_allclose(ours, ref, atol=3e-5, rtol=1e-4)


def test_fine_stage_matches_reference(setup):
    import torch
    p = torch.tensor(setup['pts'])[None]
    with torch.no_grad():
        mid = setup['torch_dec']['middle'](p, setup['c_grid']).numpy()
        fine = setup['torch_dec']['fine'](p, setup['c_grid']).numpy()
    ours = _ours_raw(setup, 'fine')[:, 3]
    np.testing.assert_allclose(ours, fine + mid, atol=5e-5, rtol=1e-4)


def test_color_stage_matches_reference(setup):
    import torch
    p = torch.tensor(setup['pts'])[None]
    with torch.no_grad():
        rgb = setup['torch_dec']['color'](p, setup['c_grid']).numpy()
        mid = setup['torch_dec']['middle'](p, setup['c_grid']).numpy()
        fine = setup['torch_dec']['fine'](p, setup['c_grid']).numpy()
    ours = _ours_raw(setup, 'color')
    np.testing.assert_allclose(ours[:, :3], rgb[:, :3], atol=3e-5,
                               rtol=1e-4)
    np.testing.assert_allclose(ours[:, 3], fine + mid, atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize("stage", ["middle", "fine", "color"])
def test_prepared_grids_match_canonical(setup, stage):
    """nice_eval over prepare_grids output (ExpandedGrid + fused finecolor)
    == nice_eval over canonical flat grids, fwd and grid-grad."""
    import jax
    import jax.numpy as jnp
    from nice_slam_tpu.models.decoders import nice_eval
    from nice_slam_tpu.models.grids import prepare_grids
    s = setup
    shapes_t = tuple(sorted(s['shapes'].items()))
    args = (jnp.asarray(s['pts']), stage, s['dcfg'],
            jnp.asarray(s['gcfg'].bound_np),
            jnp.asarray(s['gcfg'].coarse_bound_np), shapes_t)
    base = np.asarray(nice_eval(s['params'], s['grids'], *args))
    fast = np.asarray(nice_eval(
        s['params'], prepare_grids(s['grids'], shapes_t), *args))
    np.testing.assert_allclose(fast, base, atol=5e-5, rtol=1e-4)
    assert 'finecolor' in prepare_grids(s['grids'], shapes_t)

    def base_loss(g):
        return jnp.sum(nice_eval(s['params'], g, *args) ** 2)

    def fast_loss(g):
        return jnp.sum(nice_eval(
            s['params'], prepare_grids(g, shapes_t), *args) ** 2)

    g0 = jax.grad(base_loss)(s['grids'])
    g1 = jax.grad(fast_loss)(s['grids'])
    for name in g0:
        np.testing.assert_allclose(np.asarray(g1[name]),
                                   np.asarray(g0[name]),
                                   atol=2e-4, rtol=2e-4)


def test_coarse_decoder_matches_reference(setup):
    import torch
    p = torch.tensor(setup['pts'])[None]
    with torch.no_grad():
        ref = setup['torch_dec']['coarse'](p, setup['c_grid']).numpy()
    ours = _ours_raw(setup, 'coarse')[:, 3]
    np.testing.assert_allclose(ours, ref, atol=3e-5, rtol=1e-4)


def test_compositing_matches_reference(setup):
    import torch
    import jax.numpy as jnp
    from src.common import raw2outputs_nerf_color
    from nice_slam_tpu.core.composite import composite_rays

    rng = np.random.default_rng(1)
    raw = rng.normal(size=(64, 48, 4)).astype(np.float32)
    z = np.sort(rng.uniform(0.1, 4.0, (64, 48)), -1).astype(np.float32)
    d = rng.normal(size=(64, 3)).astype(np.float32)

    for occ in (True, False):
        dep_t, var_t, rgb_t, w_t = raw2outputs_nerf_color(
            torch.tensor(raw.copy()), torch.tensor(z), torch.tensor(d),
            occupancy=occ, device='cpu')
        dep_j, var_j, rgb_j, w_j = composite_rays(
            jnp.asarray(raw), jnp.asarray(z), jnp.asarray(d), occupancy=occ)
        np.testing.assert_allclose(np.asarray(dep_j), dep_t.numpy(),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(rgb_j), rgb_t.numpy(),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(w_j), w_t.numpy(),
                                   atol=1e-4, rtol=1e-4)


def test_sample_pdf_matches_reference_det(setup):
    import torch
    import jax
    import jax.numpy as jnp
    from src.common import sample_pdf as ref_sample_pdf
    from nice_slam_tpu.core.sampling import sample_pdf

    rng = np.random.default_rng(2)
    bins = np.sort(rng.uniform(0, 4, (16, 31)), -1).astype(np.float32)
    weights = rng.random((16, 30)).astype(np.float32)
    ref = ref_sample_pdf(torch.tensor(bins), torch.tensor(weights), 12,
                         det=True, device='cpu').numpy()
    ours = np.asarray(sample_pdf(jax.random.PRNGKey(0), jnp.asarray(bins),
                                 jnp.asarray(weights), 12, det=True))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)


def test_render_batch_ray_matches_reference(setup):
    """END-TO-END renderer differential: the reference's
    Renderer.render_batch_ray (torch, CPU) against our render_rays on
    identical decoder weights, grids and rays — one check covering
    near/far construction, the 32+16 stratified+surface sampling
    (including depth-zero rays' uniform sweep), the sort-merge, the color
    stage dispatch, out-of-bound occ=100 and alpha compositing
    (/root/reference/src/utils/Renderer.py:95-262).  Runs both with
    sensor depth and without (the gt_depth=None near=0.01 branch)."""
    import torch
    import jax.numpy as jnp
    from types import SimpleNamespace
    from src.utils.Renderer import Renderer
    from src.conv_onet.models.decoder import NICE
    from nice_slam_tpu.render.renderer import (
        RenderConfig, SceneModel, render_rays)

    s = setup
    nice = NICE(coarse=True)
    nice.middle_decoder = s['torch_dec']['middle']
    nice.fine_decoder = s['torch_dec']['fine']
    nice.color_decoder = s['torch_dec']['color']
    nice.coarse_decoder = s['torch_dec']['coarse']

    cfg = {'rendering': {'lindisp': False, 'perturb': 0.0, 'N_samples': 32,
                         'N_surface': 16, 'N_importance': 0},
           'scale': 1, 'occupancy': True}
    bound_t = torch.tensor(np.asarray(s['gcfg'].bound_np))
    slam = SimpleNamespace(nice=True, bound=bound_t, H=24, W=32, fx=16.0,
                           fy=16.0, cx=15.5, cy=11.5)
    ref_r = Renderer(cfg, None, slam)

    rng = np.random.default_rng(5)
    n = 64
    o = np.tile(np.array([0.2, 0.1, 0.2], dtype=np.float32), (n, 1))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    gt = (0.4 + 0.8 * rng.random(n)).astype(np.float32)
    gt[::7] = 0.0               # depth-zero rays exercise the sweep branch

    model = SceneModel(kind='nice', decoder=s['dcfg'],
                       bound=jnp.asarray(s['gcfg'].bound_np),
                       coarse_bound=jnp.asarray(s['gcfg'].coarse_bound_np),
                       grid_shapes=tuple(sorted(s['shapes'].items())),
                       expanded=False)
    rcfg = RenderConfig(n_samples=32, n_surface=16)

    for depth_in in (gt, None):
        with torch.no_grad():
            ref_depth, ref_unc, ref_color = ref_r.render_batch_ray(
                s['c_grid'], nice, torch.tensor(d), torch.tensor(o), 'cpu',
                'color',
                None if depth_in is None else torch.tensor(depth_in))
        depth, var, color, _ = render_rays(
            s['params'], s['grids'], jnp.asarray(o), jnp.asarray(d),
            stage='color', model=model, rcfg=rcfg,
            gt_depth=None if depth_in is None else jnp.asarray(depth_in))
        tag = 'no-depth' if depth_in is None else 'with-depth'
        np.testing.assert_allclose(np.asarray(depth), ref_depth.numpy(),
                                   atol=1e-3, rtol=1e-3, err_msg=tag)
        np.testing.assert_allclose(np.asarray(var), ref_unc.numpy(),
                                   atol=1e-3, rtol=1e-3, err_msg=tag)
        np.testing.assert_allclose(np.asarray(color), ref_color.numpy(),
                                   atol=1e-3, rtol=1e-3, err_msg=tag)
