"""Pallas VMEM gather formulations: which ones Mosaic accepts, and speed.

Table [M, W] f32 resident in VMEM; gather N rows by index.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 50


def dev_time(fn, *args, k=K, label=''):
    import jax
    from jax import lax

    @jax.jit
    def run(c, *a):
        def body(i, c):
            return c + fn(*a, i).sum()
        return lax.fori_loop(0, k, body, c)

    c = run(jnp_f32(0), *args)
    jax.block_until_ready(c)
    t0 = time.perf_counter()
    c = run(jnp_f32(0), *args)
    jax.block_until_ready(c)
    ms = (time.perf_counter() - t0) / k * 1e3
    print(f'{label:55s} {ms:8.3f} ms/iter  '
          f'({args[1].shape[0] * 1e-3 / ms:.0f} Mrows/s)' if len(args) > 1
          else f'{label:55s} {ms:8.3f} ms/iter')
    return ms


def jnp_f32(x):
    import jax.numpy as jnp
    return jnp.float32(x)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from nice_slam_tpu.utils.compilation_cache import enable
    enable()

    key = jax.random.PRNGKey(0)
    M, W, N = 58240, 128, 49152
    kg, ki = jax.random.split(key)
    tbl = jax.random.normal(kg, (M, W))
    idx = jax.random.randint(ki, (N,), 0, M)
    ref = tbl[idx]

    TILE = 4096

    # (a) take_along_axis with per-lane broadcast indices
    def kern_a(idx_ref, tbl_ref, out_ref):
        ids = idx_ref[:]                      # [TILE, 1] int32
        ids2 = jnp.broadcast_to(ids, (TILE, W))
        out_ref[:] = jnp.take_along_axis(tbl_ref[:], ids2, axis=0)

    def make_call(kern, idx2d):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((N, W), jnp.float32),
            grid=(N // TILE,),
            in_specs=[
                pl.BlockSpec((TILE, 1) if idx2d else (TILE,),
                             (lambda i: (i, 0)) if idx2d else
                             (lambda i: (i,)),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((M, W), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE, W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )

    try:
        f = make_call(kern_a, True)
        out = jax.jit(lambda t, ix: f(ix[:, None], t))(tbl, idx)
        err = float(jnp.abs(out - ref).max())
        print('(a) take_along_axis err:', err)
        fn = jax.jit(lambda t, ix, i: f(((ix + i) % M)[:, None], t))
        dev_time(fn, tbl, idx, label='(a) pallas take_along_axis VMEM')
    except Exception as e:
        print('(a) failed:', type(e).__name__, str(e)[:300])

    # (b) jnp.take rows
    def kern_b(idx_ref, tbl_ref, out_ref):
        out_ref[:] = jnp.take(tbl_ref[:], idx_ref[:].reshape(TILE), axis=0)

    try:
        f = make_call(kern_b, True)
        out = jax.jit(lambda t, ix: f(ix[:, None], t))(tbl, idx)
        err = float(jnp.abs(out - ref).max())
        print('(b) take err:', err)
        fn = jax.jit(lambda t, ix, i: f(((ix + i) % M)[:, None], t))
        dev_time(fn, tbl, idx, label='(b) pallas jnp.take VMEM')
    except Exception as e:
        print('(b) failed:', type(e).__name__, str(e)[:300])

    # (c) scalar loop with pl.ds row loads, idx via SMEM scalar prefetch
    def kern_c(idx_ref, tbl_ref, out_ref):
        def body(i, _):
            out_ref[i, :] = tbl_ref[idx_ref[i], :]
            return 0
        jax.lax.fori_loop(0, TILE, body, 0)

    try:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(N // TILE,),
            in_specs=[
                pl.BlockSpec((TILE,), lambda i: (i,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((M, W), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE, W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )
        f = pl.pallas_call(kern_c,
                           out_shape=jax.ShapeDtypeStruct((N, W),
                                                          jnp.float32),
                           grid_spec=grid_spec)
        out = jax.jit(lambda t, ix: f(ix, t))(tbl, idx)
        err = float(jnp.abs(out - ref).max())
        print('(c) scalar-loop err:', err)
        fn = jax.jit(lambda t, ix, i: f((ix + i) % M, t))
        dev_time(fn, tbl, idx, label='(c) pallas scalar-loop rows')
    except Exception as e:
        print('(c) failed:', type(e).__name__, str(e)[:300])


if __name__ == '__main__':
    main()
