"""Scene-representation decoders (L1).

Functional parity targets (/root/reference/src/conv_onet/models/decoder.py):
  * MLP (middle/fine/color, :97-219): positional embedding -> n_blocks dense
    layers (hidden 32 for NICE), ReLU, a skip concat of the embedding at
    block index in `skips`, and a per-block feature injection
    `h += fc_c[i](grid_feature)`.
  * MLP_no_xyz (coarse, :222-297): grid feature alone is the input.
  * NICE stage dispatch (:336-370): coarse->occ, middle->occ,
    fine->fine+middle occ (middle features sampled with stop_gradient,
    :199-202), color->rgb from the color decoder with occ overwritten by
    fine+middle.
  * iMAP single MLP (conv_onet/config.py:28-32): c_dim=0, hidden 256,
    4 blocks, no skips, color head.

Design: parameters are plain pytrees (nested dicts/lists of jnp arrays);
every forward is a pure function of (params, grids, points).  The per-point
MLP is a stack of [N, hidden] @ [hidden, hidden] matmuls — large point
batches keep the MXU busy; XLA fuses the ReLU/add chains.

Init matches torch's `xavier_uniform_(gain=calculate_gain(act))` with zero
bias (decoder.py:77-85): U(-a, a), a = gain * sqrt(6/(fan_in+fan_out)),
gain = sqrt(2) for relu layers and 1 for the linear output.
"""

from __future__ import annotations

import contextlib
import math
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from nice_slam_tpu.models.embeddings import (
    fourier_embed, init_fourier_b, nerf_embed, nerf_embed_dim)
from nice_slam_tpu.ops.trilinear import sample_grid_feature

Params = Any  # nested dict/list pytree of jnp arrays

STAGES = ('coarse', 'middle', 'fine', 'color')
STAGE_INDEX = {s: i for i, s in enumerate(STAGES)}


class DecoderConfig(NamedTuple):
    """Static decoder hyperparameters (config keys `model.*`,
    configs/nice_slam.yaml:133-136)."""

    c_dim: int = 32
    hidden_size: int = 32
    n_blocks: int = 5
    skips: tuple[int, ...] = (2,)
    pos_embedding_method: str = 'fourier'  # 'fourier' | 'nerf' | 'same'
    coarse: bool = True
    # iMAP variant
    imap_hidden: int = 256
    imap_blocks: int = 4
    # Matmul precision for the decoder MLP stack only (None = inherit the
    # session default, which the orchestrator pins to 'float32' — 6-pass
    # bf16 emulation on the MXU).  'BF16_BF16_F32_X3' cuts the MLP cost
    # ~2x with ~f32 effective mantissa coverage; pose-critical math
    # outside the decoders keeps the session default either way.  Config
    # key: model.decoder_matmul_precision.
    mm_precision: str | None = None

    def embed_dim(self, color: bool) -> int:
        if self.pos_embedding_method == 'fourier':
            return 93
        if self.pos_embedding_method == 'same':
            return 3
        if self.pos_embedding_method == 'nerf':
            return nerf_embed_dim(10 if color else 5)
        raise ValueError(self.pos_embedding_method)


def _xavier_uniform(key: jax.Array, shape: tuple[int, int], gain: float
                    ) -> jnp.ndarray:
    fan_in, fan_out = shape
    a = gain * math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, minval=-a, maxval=a)


def _init_dense(key: jax.Array, in_dim: int, out_dim: int,
                gain: float) -> Params:
    return {'w': _xavier_uniform(key, (in_dim, out_dim), gain),
            'b': jnp.zeros((out_dim,))}


def _dense(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    return x @ p['w'] + p['b']


def _prec_ctx(cfg: 'DecoderConfig'):
    """Trace-time matmul-precision scope for the decoder stack.

    jax.default_matmul_precision stamps the precision onto every dot
    traced inside, including those replayed by the VJP, so the backward
    matmuls get the same treatment."""
    if cfg.mm_precision is None:
        return contextlib.nullcontext()
    return jax.default_matmul_precision(cfg.mm_precision)


_RELU_GAIN = math.sqrt(2.0)


def init_mlp(key: jax.Array, cfg: DecoderConfig, *, c_dim: int, color: bool,
             hidden: int | None = None, n_blocks: int | None = None,
             skips: tuple[int, ...] | None = None) -> Params:
    """Init an `MLP` decoder (embedding + pts_linears + fc_c + output)."""
    hidden = cfg.hidden_size if hidden is None else hidden
    n_blocks = cfg.n_blocks if n_blocks is None else n_blocks
    skips = cfg.skips if skips is None else skips
    embed_dim = cfg.embed_dim(color)
    keys = jax.random.split(key, 2 * n_blocks + 2)

    params: dict[str, Any] = {}
    if cfg.pos_embedding_method == 'fourier':
        params['embed_b'] = init_fourier_b(keys[0])

    pts = []
    in_dim = embed_dim
    for i in range(n_blocks):
        pts.append(_init_dense(keys[1 + i], in_dim, hidden, _RELU_GAIN))
        in_dim = hidden + embed_dim if i in skips else hidden
    params['pts_linears'] = pts

    if c_dim > 0:
        params['fc_c'] = [
            _init_dense(keys[1 + n_blocks + i], c_dim, hidden, 1.0)
            for i in range(n_blocks)]

    params['out'] = _init_dense(keys[-1], in_dim, 4 if color else 1, 1.0)
    return params


def _embed(params: Params, cfg: DecoderConfig, p: jnp.ndarray, color: bool
           ) -> jnp.ndarray:
    if cfg.pos_embedding_method == 'fourier':
        return fourier_embed(params['embed_b'], p)
    if cfg.pos_embedding_method == 'same':
        return p
    if cfg.pos_embedding_method == 'nerf':
        if color:
            return nerf_embed(p, 10, log_sampling=True)
        return nerf_embed(p, 5, log_sampling=False)
    raise ValueError(cfg.pos_embedding_method)


def mlp_dispatch(params: Params, cfg: DecoderConfig, p: jnp.ndarray,
                 c_feat: jnp.ndarray | None, *, color: bool,
                 skips: tuple[int, ...] | None = None,
                 fused: bool = False) -> jnp.ndarray:
    """mlp_apply, or the fused Pallas kernel when requested and applicable.

    The fused kernel (ops/pallas/fused_mlp.py) keeps the whole layer stack
    in VMEM — profitable on eval-heavy paths (mesher lattice query,
    full-frame renders).  It implements the fourier-embedding MLP with
    grid features, so other configurations fall through to XLA.
    """
    if (fused and cfg.pos_embedding_method == 'fourier'
            and c_feat is not None and jax.default_backend() == 'tpu'):
        from nice_slam_tpu.ops.pallas.fused_mlp import fused_mlp
        return fused_mlp(params, cfg, p, c_feat, color,
                         cfg.skips if skips is None else skips)
    return mlp_apply(params, cfg, p, c_feat, color=color, skips=skips)


def mlp_apply(params: Params, cfg: DecoderConfig, p: jnp.ndarray,
              c_feat: jnp.ndarray | None, *, color: bool,
              skips: tuple[int, ...] | None = None) -> jnp.ndarray:
    """Forward pass of `MLP` (decoder.py:190-219).

    Args:
      p: [N, 3] world points.
      c_feat: [N, c_dim] grid features (None for iMAP's c_dim=0).
    Returns:
      [N, 4] if color else [N].
    """
    skips = cfg.skips if skips is None else skips
    with _prec_ctx(cfg):
        embedded = _embed(params, cfg, p, color)
        h = embedded
        fc_all = None
        if c_feat is not None:
            # c_feat is constant across blocks, so the five per-block
            # feature injections `fc_c[i](c)` collapse into ONE wide matmul
            # (hidden-32 K/N dims use ~1/16 of an MXU pass; batching the N
            # axis 5x is the same math — identical per-column dot order —
            # with far better utilization).
            w_all = jnp.concatenate([l['w'] for l in params['fc_c']], axis=1)
            b_all = jnp.concatenate([l['b'] for l in params['fc_c']])
            fc_all = c_feat @ w_all + b_all
            hidden = params['fc_c'][0]['w'].shape[1]
        for i, layer in enumerate(params['pts_linears']):
            h = jax.nn.relu(_dense(layer, h))
            if fc_all is not None:
                h = h + jax.lax.dynamic_slice_in_dim(
                    fc_all, i * hidden, hidden, axis=1)
            if i in skips:
                h = jnp.concatenate([embedded, h], axis=-1)
        out = _dense(params['out'], h)
        return out if color else out[..., 0]


def init_mlp_no_xyz(key: jax.Array, cfg: DecoderConfig, *, color: bool = False
                    ) -> Params:
    """Init `MLP_no_xyz` (coarse decoder, decoder.py:222-297)."""
    hidden = cfg.hidden_size
    n_blocks = cfg.n_blocks
    keys = jax.random.split(key, n_blocks + 1)
    pts = []
    in_dim = hidden  # first layer consumes the grid feature (c_dim==hidden)
    for i in range(n_blocks):
        pts.append(_init_dense(keys[i], in_dim, hidden, _RELU_GAIN))
        in_dim = hidden + cfg.c_dim if i in cfg.skips else hidden
    return {'pts_linears': pts,
            'out': _init_dense(keys[-1], in_dim, 4 if color else 1, 1.0)}


def mlp_no_xyz_apply(params: Params, cfg: DecoderConfig,
                     c_feat: jnp.ndarray, *, color: bool = False
                     ) -> jnp.ndarray:
    """Forward pass of `MLP_no_xyz` (decoder.py:285-297)."""
    with _prec_ctx(cfg):
        h = c_feat
        for i, layer in enumerate(params['pts_linears']):
            h = jax.nn.relu(_dense(layer, h))
            if i in cfg.skips:
                h = jnp.concatenate([c_feat, h], axis=-1)
        out = _dense(params['out'], h)
        return out if color else out[..., 0]


# ---------------------------------------------------------------------------
# NICE: four decoders + stage dispatch
# ---------------------------------------------------------------------------

def init_nice_decoders(key: jax.Array, cfg: DecoderConfig) -> Params:
    """Init the full NICE decoder set (decoder.py:300-334)."""
    k_coarse, k_mid, k_fine, k_color = jax.random.split(key, 4)
    params = {
        'middle': init_mlp(k_mid, cfg, c_dim=cfg.c_dim, color=False),
        'fine': init_mlp(k_fine, cfg, c_dim=cfg.c_dim * 2, color=False),
        'color': init_mlp(k_color, cfg, c_dim=cfg.c_dim, color=True),
    }
    if cfg.coarse:
        params['coarse'] = init_mlp_no_xyz(k_coarse, cfg, color=False)
    return params


def nice_eval(params: Params, grids: dict[str, jnp.ndarray], p: jnp.ndarray,
              stage: str, cfg: DecoderConfig, bound: jnp.ndarray,
              coarse_bound: jnp.ndarray | None = None,
              grid_shapes: tuple | None = None,
              fused: bool = False) -> jnp.ndarray:
    """Evaluate the NICE model at points for a given stage (decoder.py:336-370).

    Args:
      grids: {'coarse','middle','fine','color'} -> [Nx, Ny, Nz, c_dim] or
        flat [M, c_dim] (then `grid_shapes` provides the (Nx, Ny, Nz)s).
      p: [N, 3] world points.
      stage: one of STAGES (static).
      bound: [3, 2] scene bound; coarse_bound: enlarged bound for the coarse
        grid (NICE_SLAM.py:208).
      grid_shapes: static ((name, (nx, ny, nz)), ...) for flat grids.
    Returns:
      raw: [N, 4] (r, g, b, occ_logit); rgb is zero except in 'color'.
    """
    shapes = dict(grid_shapes) if grid_shapes else {}

    # 'finecolor' is the channel-fused fine+color buffer produced by
    # models.grids.prepare_grids: one gathered row serves both volumes.
    fused_cache = []

    def feat_of(name, bnd):
        if name in ('fine', 'color') and 'finecolor' in grids:
            if not fused_cache:
                fused_cache.append(sample_grid_feature(
                    grids['finecolor'], p, bnd, shapes.get('fine')))
            both = fused_cache[0]
            return (both[..., :cfg.c_dim] if name == 'fine'
                    else both[..., cfg.c_dim:])
        return sample_grid_feature(grids[name], p, bnd, shapes.get(name))

    if stage == 'coarse':
        feat = feat_of('coarse', coarse_bound)
        occ = mlp_no_xyz_apply(params['coarse'], cfg, feat)
        return jnp.concatenate(
            [jnp.zeros(p.shape[:-1] + (3,)), occ[..., None]], axis=-1)

    c_mid = feat_of('middle', bound)
    middle_occ = mlp_dispatch(params['middle'], cfg, p, c_mid, color=False,
                              fused=fused)
    if stage == 'middle':
        return jnp.concatenate(
            [jnp.zeros(p.shape[:-1] + (3,)), middle_occ[..., None]], axis=-1)

    # fine decoder concats its own feature with a stop-gradient middle sample
    # (decoder.py:196-202)
    c_fine = feat_of('fine', bound)
    c_mid_sg = jax.lax.stop_gradient(c_mid)
    fine_occ = mlp_dispatch(params['fine'], cfg, p,
                            jnp.concatenate([c_fine, c_mid_sg], axis=-1),
                            color=False, fused=fused)
    occ = fine_occ + middle_occ
    if stage == 'fine':
        return jnp.concatenate(
            [jnp.zeros(p.shape[:-1] + (3,)), occ[..., None]], axis=-1)

    assert stage == 'color', stage
    c_color = feat_of('color', bound)
    rgb_raw = mlp_dispatch(params['color'], cfg, p, c_color, color=True,
                           fused=fused)
    return jnp.concatenate([rgb_raw[..., :3], occ[..., None]], axis=-1)


# ---------------------------------------------------------------------------
# iMAP*: one MLP over positional encoding
# ---------------------------------------------------------------------------

def init_imap_decoder(key: jax.Array, cfg: DecoderConfig) -> Params:
    """Single-MLP iMAP* decoder (conv_onet/config.py:28-32)."""
    return init_mlp(key, cfg, c_dim=0, color=True, hidden=cfg.imap_hidden,
                    n_blocks=cfg.imap_blocks, skips=())


def imap_eval(params: Params, p: jnp.ndarray, cfg: DecoderConfig
              ) -> jnp.ndarray:
    """Evaluate the iMAP decoder: [N, 3] -> [N, 4] (r, g, b, sigma)."""
    return mlp_apply(params, cfg, p, None, color=True, skips=())
