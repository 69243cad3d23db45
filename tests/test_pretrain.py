"""Pretrained-decoder import: synthesize a torch checkpoint in the
reference's exact format (NICE_SLAM.py:210-241 — middle weights under the
'decoder.coarse.*' prefix, fine under 'decoder.fine.*') and verify the
imported pytree reproduces the torch modules' outputs."""

import numpy as np
import pytest
import torch

from tests.util import make_test_cfg


def _torch_mlp_state(rng, n_blocks=5, hidden=32, c_dim=32, embed=93,
                     skips=(2,)):
    sd = {}
    in_dim = embed
    for i in range(n_blocks):
        sd[f'pts_linears.{i}.weight'] = torch.tensor(
            rng.normal(size=(hidden, in_dim)).astype(np.float32))
        sd[f'pts_linears.{i}.bias'] = torch.tensor(
            rng.normal(size=(hidden,)).astype(np.float32))
        in_dim = hidden + embed if i in skips else hidden
    for i in range(n_blocks):
        sd[f'fc_c.{i}.weight'] = torch.tensor(
            rng.normal(size=(hidden, c_dim)).astype(np.float32))
        sd[f'fc_c.{i}.bias'] = torch.tensor(
            rng.normal(size=(hidden,)).astype(np.float32))
    sd['output_linear.weight'] = torch.tensor(
        rng.normal(size=(1, in_dim)).astype(np.float32))
    sd['output_linear.bias'] = torch.tensor(
        rng.normal(size=(1,)).astype(np.float32))
    sd['embedder._B'] = torch.tensor(
        rng.normal(size=(3, embed)).astype(np.float32))
    return sd


def test_import_middle_fine(tmp_path):
    import jax
    from nice_slam_tpu.models.decoders import (
        DecoderConfig, init_nice_decoders)
    from nice_slam_tpu.models.pretrain import load_torch_pretrain

    rng = np.random.default_rng(0)
    middle_sd = _torch_mlp_state(rng, c_dim=32)
    fine_sd = _torch_mlp_state(rng, c_dim=64)

    ckpt = {'model': {}}
    # the reference checkpoint stores middle under 'decoder.coarse.'
    for k, v in middle_sd.items():
        ckpt['model']['decoder.coarse.' + k] = v
    for k, v in fine_sd.items():
        ckpt['model']['decoder.fine.' + k] = v
    path = str(tmp_path / 'middle_fine.pt')
    torch.save(ckpt, path)

    dcfg = DecoderConfig()
    params = init_nice_decoders(jax.random.PRNGKey(0), dcfg)
    out = load_torch_pretrain(params, {'middle_fine': path}, coarse=False)

    np.testing.assert_allclose(
        np.asarray(out['middle']['pts_linears'][0]['w']),
        middle_sd['pts_linears.0.weight'].numpy().T)
    np.testing.assert_allclose(
        np.asarray(out['fine']['fc_c'][3]['b']),
        fine_sd['fc_c.3.bias'].numpy())
    np.testing.assert_allclose(
        np.asarray(out['middle']['embed_b']),
        middle_sd['embedder._B'].numpy())
    # untouched decoders keep their init
    np.testing.assert_allclose(np.asarray(out['color']['out']['w']),
                               np.asarray(params['color']['out']['w']))


def test_imported_weights_match_torch_forward(tmp_path):
    """End to end: import + forward through our MLP == torch reference MLP."""
    import jax
    import jax.numpy as jnp
    from nice_slam_tpu.models.decoders import (
        DecoderConfig, init_nice_decoders, mlp_apply)
    from nice_slam_tpu.models.pretrain import load_torch_pretrain

    rng = np.random.default_rng(1)
    middle_sd = _torch_mlp_state(rng, c_dim=32)
    ckpt = {'model': {}}
    for k, v in middle_sd.items():
        ckpt['model']['decoder.coarse.' + k] = v
        ckpt['model']['decoder.fine.' + k.replace('fc_c.', 'fc_c.')] = v
    # give fine its own (c_dim 64) weights so load succeeds structurally
    fine_sd = _torch_mlp_state(rng, c_dim=64)
    for k, v in fine_sd.items():
        ckpt['model']['decoder.fine.' + k] = v
    path = str(tmp_path / 'mf.pt')
    torch.save(ckpt, path)

    dcfg = DecoderConfig()
    params = init_nice_decoders(jax.random.PRNGKey(0), dcfg)
    out = load_torch_pretrain(params, {'middle_fine': path}, coarse=False)

    pts = rng.uniform(-1, 1, (64, 3)).astype(np.float32)
    feat = rng.normal(size=(64, 32)).astype(np.float32)
    ours = np.asarray(mlp_apply(out['middle'], dcfg, jnp.asarray(pts),
                                jnp.asarray(feat), color=False))

    # manual torch forward with the same semantics
    h = torch.sin(torch.tensor(pts) @ middle_sd['embedder._B'])
    emb = h
    for i in range(5):
        h = torch.relu(h @ middle_sd[f'pts_linears.{i}.weight'].T
                       + middle_sd[f'pts_linears.{i}.bias'])
        h = h + torch.tensor(feat) @ middle_sd[f'fc_c.{i}.weight'].T \
            + middle_sd[f'fc_c.{i}.bias']
        if i == 2:
            h = torch.cat([emb, h], dim=-1)
    ref = (h @ middle_sd['output_linear.weight'].T
           + middle_sd['output_linear.bias'])[:, 0].numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-4)
