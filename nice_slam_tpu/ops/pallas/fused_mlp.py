"""Pallas TPU kernel: fused decoder MLP forward.

The decoder hot path evaluates a small MLP (fourier embedding + n_blocks
dense layers with per-block feature injection and one skip concat,
models/decoders.py:mlp_apply) over very large point batches.  Under plain
XLA every layer's [N, hidden] intermediate round-trips HBM; this kernel
keeps a whole point block plus all weights resident in VMEM and runs the
entire stack in one launch.  Weights total < 100 KB, so block size is
bounded only by the activations (~1 MB at block 2048).

Differentiation: the kernel is wrapped in jax.custom_vjp whose backward is
XLA's autodiff of the identical pure-jnp reference (mlp_apply) — forward
gets the fused kernel (it dominates eval-only paths like the mesher's
16.7M-point lattice query and the visualizer's full-frame renders), while
training gradients reuse the well-tested XLA path.

Falls back to mlp_apply on non-TPU backends (interpret mode is used in the
CPU test-suite).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nice_slam_tpu.models.decoders import DecoderConfig, mlp_apply

BLOCK = 1024


def _flatten_params(params: Any, n_blocks: int, has_fc: bool):
    """Stable flat ordering of the MLP weights for pallas_call operands."""
    flat = [params['embed_b']]
    for i in range(n_blocks):
        flat += [params['pts_linears'][i]['w'], params['pts_linears'][i]['b']]
    if has_fc:
        for i in range(n_blocks):
            flat += [params['fc_c'][i]['w'], params['fc_c'][i]['b']]
    flat += [params['out']['w'], params['out']['b']]
    return flat


def _kernel(n_blocks: int, has_fc: bool, skips: tuple, out_dim: int,
            *refs):
    """Kernel body: refs = [p, c?, embed_b, (w,b)*n, (fcw,fcb)*n?, ow, ob,
    out]."""
    i = 0
    p_ref = refs[i]; i += 1
    c_ref = None
    if has_fc:
        c_ref = refs[i]; i += 1
    embed_ref = refs[i]; i += 1
    pts = [(refs[i + 2 * k], refs[i + 2 * k + 1]) for k in range(n_blocks)]
    i += 2 * n_blocks
    fcs = []
    if has_fc:
        fcs = [(refs[i + 2 * k], refs[i + 2 * k + 1])
               for k in range(n_blocks)]
        i += 2 * n_blocks
    ow_ref = refs[i]; ob_ref = refs[i + 1]
    out_ref = refs[i + 2]

    p = p_ref[:]
    emb = jnp.sin(jnp.dot(p, embed_ref[:],
                          preferred_element_type=jnp.float32))
    h = emb
    c = c_ref[:] if has_fc else None
    for k in range(n_blocks):
        w, b = pts[k]
        h = jnp.maximum(
            jnp.dot(h, w[:], preferred_element_type=jnp.float32) + b[:],
            0.0)
        if has_fc:
            fw, fb = fcs[k]
            h = h + jnp.dot(c, fw[:],
                            preferred_element_type=jnp.float32) + fb[:]
        if k in skips:
            h = jnp.concatenate([emb, h], axis=-1)
    out = jnp.dot(h, ow_ref[:], preferred_element_type=jnp.float32) \
        + ob_ref[:]
    out_ref[:] = out


def _fused_forward(params: Any, cfg: DecoderConfig, p: jnp.ndarray,
                   c_feat: jnp.ndarray | None, color: bool,
                   skips: tuple, interpret: bool) -> jnp.ndarray:
    n_blocks = len(params['pts_linears'])
    has_fc = c_feat is not None
    out_dim = 4 if color else 1
    n = p.shape[0]
    pad = (-n) % BLOCK
    p_pad = jnp.pad(p, ((0, pad), (0, 0)))
    ops = [p_pad]
    if has_fc:
        ops.append(jnp.pad(c_feat, ((0, pad), (0, 0))))
    ops += _flatten_params(params, n_blocks, has_fc)

    n_pad = n + pad
    grid = (n_pad // BLOCK,)

    in_specs = [pl.BlockSpec((BLOCK, p_pad.shape[1]), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    if has_fc:
        in_specs.append(pl.BlockSpec((BLOCK, ops[1].shape[1]),
                                     lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
    for w in ops[2 if has_fc else 1:]:
        # weights: whole array resident, same for every grid step
        in_specs.append(pl.BlockSpec(
            w.shape, lambda i, n=w.ndim: (0,) * n,
            memory_space=pltpu.VMEM))

    kernel = functools.partial(_kernel, n_blocks, has_fc, skips, out_dim)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, out_dim), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((BLOCK, out_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*ops)
    out = out[:n]
    return out if color else out[:, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 4, 5, 6))
def fused_mlp(params: Any, cfg: DecoderConfig, p: jnp.ndarray,
              c_feat: jnp.ndarray | None, color: bool,
              skips: tuple = (2,), interpret: bool = False) -> jnp.ndarray:
    """Drop-in fused replacement for models.decoders.mlp_apply."""
    return _fused_forward(params, cfg, p, c_feat, color, skips, interpret)


def _fwd(params, cfg, p, c_feat, color, skips, interpret):
    out = _fused_forward(params, cfg, p, c_feat, color, skips, interpret)
    return out, (params, p, c_feat)


def _bwd(cfg, color, skips, interpret, residuals, g):
    params, p, c_feat = residuals
    # backward via XLA autodiff of the identical reference computation
    def ref(params, p, c_feat):
        return mlp_apply(params, cfg, p, c_feat, color=color, skips=skips)
    _, vjp = jax.vjp(ref, params, p, c_feat)
    return vjp(g)


fused_mlp.defvjp(_fwd, _bwd)
