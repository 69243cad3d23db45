"""Import ConvONet-pretrained decoder checkpoints (torch) into our pytrees.

Functional parity target: NICE_SLAM.load_pretrain
(/root/reference/src/NICE_SLAM.py:210-241):
  * `pretrained_decoders.coarse` holds the coarse MLP_no_xyz under
    'decoder.*' keys;
  * `pretrained_decoders.middle_fine` holds BOTH middle and fine decoders —
    middle's weights are (confusingly) stored under the 'decoder.coarse.*'
    prefix and fine's under 'decoder.fine.*' (:232-239).

torch Linear weights are [out, in]; ours are [in, out], so each matrix is
transposed on import.  torch runs on CPU here (the baked-in torch has no
accelerator) purely as a checkpoint codec.
"""

from __future__ import annotations

from typing import Any

import numpy as np


def _strip(ckpt_model: dict, prefix: str) -> dict:
    out = {}
    for key, val in ckpt_model.items():
        if 'decoder' in key and 'encoder' not in key \
                and key.startswith(prefix):
            out[key[len(prefix):]] = np.asarray(val.detach().cpu().numpy())
    return out


def _convert_mlp(torch_params: dict, target: Any) -> Any:
    """Fill our MLP param pytree from torch state-dict entries."""
    import jax.numpy as jnp
    out = dict(target)
    n_blocks = len(target['pts_linears'])
    out['pts_linears'] = [
        {'w': jnp.asarray(torch_params[f'pts_linears.{i}.weight'].T),
         'b': jnp.asarray(torch_params[f'pts_linears.{i}.bias'])}
        for i in range(n_blocks)]
    if 'fc_c' in target and f'fc_c.0.weight' in torch_params:
        out['fc_c'] = [
            {'w': jnp.asarray(torch_params[f'fc_c.{i}.weight'].T),
             'b': jnp.asarray(torch_params[f'fc_c.{i}.bias'])}
            for i in range(n_blocks)]
    out['out'] = {'w': jnp.asarray(torch_params['output_linear.weight'].T),
                  'b': jnp.asarray(torch_params['output_linear.bias'])}
    if 'embed_b' in target and 'embedder._B' in torch_params:
        out['embed_b'] = jnp.asarray(torch_params['embedder._B'])
    return out


def _mlp_to_torch_sd(params: Any, prefix: str) -> dict:
    """Inverse of _convert_mlp: our pytree -> torch state-dict entries in
    the reference checkpoint's key layout (transposed Linear weights)."""
    import torch
    sd = {}
    for i, layer in enumerate(params['pts_linears']):
        sd[f'{prefix}pts_linears.{i}.weight'] = torch.from_numpy(
            np.asarray(layer['w']).T.copy())
        sd[f'{prefix}pts_linears.{i}.bias'] = torch.from_numpy(
            np.asarray(layer['b']).copy())
    for i, layer in enumerate(params.get('fc_c', [])):
        sd[f'{prefix}fc_c.{i}.weight'] = torch.from_numpy(
            np.asarray(layer['w']).T.copy())
        sd[f'{prefix}fc_c.{i}.bias'] = torch.from_numpy(
            np.asarray(layer['b']).copy())
    sd[f'{prefix}output_linear.weight'] = torch.from_numpy(
        np.asarray(params['out']['w']).T.copy())
    sd[f'{prefix}output_linear.bias'] = torch.from_numpy(
        np.asarray(params['out']['b']).copy())
    if 'embed_b' in params:
        sd[f'{prefix}embedder._B'] = torch.from_numpy(
            np.asarray(params['embed_b']).copy())
    return sd


def save_torch_pretrain(params: Any, coarse_path: str | None,
                        middle_fine_path: str) -> None:
    """Write decoders as reference-format pretrained blobs
    (NICE_SLAM.load_pretrain's expected layout, :210-241): middle_fine.pt
    holds middle under 'decoder.coarse.*' (the reference quirk) and fine
    under 'decoder.fine.*'; coarse.pt holds the MLP_no_xyz under
    'decoder.*'."""
    import torch
    sd = {}
    sd.update(_mlp_to_torch_sd(params['middle'], 'decoder.coarse.'))
    sd.update(_mlp_to_torch_sd(params['fine'], 'decoder.fine.'))
    torch.save({'model': sd}, middle_fine_path)
    if coarse_path is not None and 'coarse' in params:
        torch.save({'model': _mlp_to_torch_sd(params['coarse'], 'decoder.')},
                   coarse_path)


def load_torch_pretrain(params: Any, pre_cfg: dict, *, coarse: bool) -> Any:
    import torch

    out = dict(params)
    ckpt = torch.load(pre_cfg['middle_fine'], map_location='cpu')
    # middle is stored under the 'coarse' prefix in this checkpoint
    middle_sd = _strip(ckpt['model'], 'decoder.coarse.')
    fine_sd = _strip(ckpt['model'], 'decoder.fine.')
    out['middle'] = _convert_mlp(middle_sd, params['middle'])
    out['fine'] = _convert_mlp(fine_sd, params['fine'])

    if coarse and pre_cfg.get('coarse'):
        import os
        if os.path.exists(pre_cfg['coarse']):
            ckpt_c = torch.load(pre_cfg['coarse'], map_location='cpu')
            coarse_sd = _strip(ckpt_c['model'], 'decoder.')
            out['coarse'] = _convert_mlp(coarse_sd, params['coarse'])
    return out
