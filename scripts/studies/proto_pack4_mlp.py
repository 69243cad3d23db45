"""Prototype: 4-point lane packing for the hidden-32 NICE decoders.

The tracking decode's MLP half runs [N,32]x[32,32]-shaped matmuls that
use ~1/16 of the MXU (K=N=32 of 128 lanes).  Packing FOUR points into
the lane dimension with a block-diagonal 4x-replicated weight matrix
([N/4, 4*in] x [4*in, 128]) runs the exact same per-point dot products
(f32, same contraction order) at full lane utilization for 4x the FLOPs
— net 4x if MXU-bound.  Round 3 rejected packing three DIFFERENT
decoders ([96,96], 3x FLOPs at 56% utilization) as slower; this is the
aligned variant of that idea.

Measures fwd and grad-wrt-points for one hidden-32 fourier MLP at the
TUM tracking scale (240k points), XLA only — if the packed layout wins
here, it graduates into models/decoders.mlp_apply as a dispatch option.

Usage: python scripts/studies/proto_pack4_mlp.py [n_points]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def bench(step, n_rep=30, label=''):
    def rep_fn():
        def body(i, acc):
            return acc + step(i)
        return jax.lax.fori_loop(0, n_rep, body, jnp.float32(0.0))
    jfn = jax.jit(rep_fn)
    float(jfn())
    tiny = jnp.zeros((8,))
    tiny_fn = jax.jit(lambda v: jnp.sum(v) * 0.0)
    float(tiny_fn(tiny))
    fetch_s = min(_timed(lambda: float(tiny_fn(tiny))) for _ in range(5))
    wall = min(_timed(lambda: float(jfn())) for _ in range(3))
    t = max((wall - fetch_s) / n_rep, 1e-9)
    print(f'{label:24s} {t * 1e3:8.3f} ms', flush=True)
    return t


def block_diag4(w):
    """[in, out] -> [4*in, 4*out] with w on the diagonal."""
    i, o = w.shape
    z = jnp.zeros((i, o), w.dtype)
    rows = [jnp.concatenate([w if r == c else z for c in range(4)], axis=1)
            for r in range(4)]
    return jnp.concatenate(rows, axis=0)


def packed_mlp(params, cfg, p, c_feat, *, color, skips):
    """mlp_apply with 4-point lane packing; bit-comparable math."""
    from nice_slam_tpu.models.decoders import _embed
    n = p.shape[0]
    assert n % 4 == 0
    embedded = _embed(params, cfg, p, color)
    e4 = embedded.reshape(n // 4, -1)              # [n/4, 4*E]
    h = e4
    fc4 = None
    if c_feat is not None:
        w_all = jnp.concatenate([l['w'] for l in params['fc_c']], axis=1)
        b_all = jnp.concatenate([l['b'] for l in params['fc_c']])
        fc_all = c_feat @ w_all + b_all            # [n, 5*32]
        hidden = params['fc_c'][0]['w'].shape[1]
        nb = len(params['fc_c'])
        # [n, nb, 32] -> [n/4, nb, 4*32]
        fc4 = fc_all.reshape(n // 4, 4, nb, hidden).transpose(0, 2, 1, 3) \
            .reshape(n // 4, nb, 4 * hidden)
    for i, layer in enumerate(params['pts_linears']):
        w4 = block_diag4(layer['w'])
        b4 = jnp.tile(layer['b'], 4)
        h = jax.nn.relu(h @ w4 + b4)
        if fc4 is not None:
            h = h + fc4[:, i]
        if i in skips:
            # per-point concat: [n/4, 4, E] ++ [n/4, 4, H] on axis -1
            e_g = e4.reshape(n // 4, 4, -1)
            h_g = h.reshape(n // 4, 4, -1)
            h = jnp.concatenate([e_g, h_g], axis=-1).reshape(n // 4, -1)
    wo4 = block_diag4(params['out']['w'])
    bo4 = jnp.tile(params['out']['b'], 4)
    out = (h @ wo4 + bo4).reshape(n, -1)
    return out if color else out[..., 0]


def main():
    jax.config.update('jax_default_matmul_precision', 'float32')
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 240 * 1024
    from nice_slam_tpu.models.decoders import (
        DecoderConfig, init_nice_decoders, mlp_apply)

    cfg = DecoderConfig()
    key = jax.random.PRNGKey(0)
    params = init_nice_decoders(key, cfg)
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.uniform(-1, 1, (n, 3)), jnp.float32)
    feat = jnp.asarray(rng.standard_normal((n, 32)), jnp.float32)

    def pert(i):
        return p + jnp.float32(i) * 1e-12

    # correctness
    a = mlp_apply(params['middle'], cfg, p[:4096], feat[:4096], color=False)
    b = packed_mlp(params['middle'], cfg, p[:4096], feat[:4096],
                   color=False, skips=cfg.skips)
    err = float(jnp.max(jnp.abs(a - b)))
    print('packed vs plain max abs err:', err, flush=True)

    bench(lambda i: mlp_apply(params['middle'], cfg, pert(i), feat,
                              color=False).ravel()[0], label='plain fwd')
    bench(lambda i: packed_mlp(params['middle'], cfg, pert(i), feat,
                               color=False, skips=cfg.skips).ravel()[0],
          label='packed4 fwd')

    def g_plain(i):
        f = lambda q: jnp.sum(mlp_apply(params['middle'], cfg, q, feat,
                                        color=False))
        return jax.grad(f)(pert(i)).ravel()[0]

    def g_packed(i):
        f = lambda q: jnp.sum(packed_mlp(params['middle'], cfg, q, feat,
                                         color=False, skips=cfg.skips))
        return jax.grad(f)(pert(i)).ravel()[0]

    bench(g_plain, label='plain grad(points)')
    bench(g_packed, label='packed4 grad(points)')


if __name__ == '__main__':
    main()
