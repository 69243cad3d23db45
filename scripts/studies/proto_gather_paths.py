"""Which gather path is fastest on this TPU?

1. XLA row-gather at several row widths / dtypes
2. XLA gather with (2, 2C) 2D slices (contiguous corner pairs)
3. Pallas kernel: table resident in VMEM, vectorized jnp.take
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 50


def dev_time(make_body, init, *, k=K, label=''):
    import jax
    from jax import lax

    @jax.jit
    def run(c):
        return lax.fori_loop(0, k, make_body, c)

    c = run(init)
    jax.block_until_ready(c)
    t0 = time.perf_counter()
    c = run(init)
    jax.block_until_ready(c)
    ms = (time.perf_counter() - t0) / k * 1e3
    print(f'{label:55s} {ms:8.3f} ms/iter')
    return ms


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from nice_slam_tpu.utils.compilation_cache import enable
    enable()

    key = jax.random.PRNGKey(0)
    M = 58240
    N = 48000
    kg, ki = jax.random.split(key)
    idx = jax.random.randint(ki, (N,), 0, M)

    # 1. XLA row gather, varying width / dtype
    for width, dt in ((32, jnp.float32), (128, jnp.float32),
                      (256, jnp.float32), (128, jnp.bfloat16),
                      (256, jnp.bfloat16)):
        tbl = jax.random.normal(kg, (M, width), dtype=dt)
        mb = N * width * tbl.dtype.itemsize / 1e6

        def body(i, c, tbl=tbl):
            r = tbl[(idx + i) % M]
            return c + r.astype(jnp.float32).sum()
        ms = dev_time(body, jnp.float32(0),
                      label=f'XLA row gather [{M},{width}] {dt.__name__} '
                            f'({mb:.0f} MB)')
        print(f'    -> {mb / ms:.1f} GB/s')

    # 2. XLA 2D-slice gather (2, 64) from [nx*ny, nz*C]
    nx, ny, nz, C = 56, 40, 26, 32
    tbl2 = jax.random.normal(kg, (nx * ny, nz * C))
    rows = jax.random.randint(ki, (N,), 0, nx * ny - 2)
    cols = (jax.random.randint(ki, (N,), 0, nz - 1)) * C
    starts = jnp.stack([rows, cols], axis=1)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(),
        start_index_map=(0, 1))

    def body(i, c):
        r = jax.lax.gather(tbl2, (starts + i) % jnp.asarray([nx*ny-2, 1]),
                           dnums, slice_sizes=(2, 2 * C))
        return c + r.sum()
    mb = N * 2 * 2 * C * 4 / 1e6
    ms = dev_time(body, jnp.float32(0),
                  label=f'XLA 2D-slice gather (2,{2*C}) ({mb:.0f} MB)')
    print(f'    -> {mb / ms:.1f} GB/s')

    # 3. Pallas: table in VMEM + vectorized take
    tbl = jax.random.normal(kg, (M, 128))

    def kernel(idx_ref, tbl_ref, out_ref):
        out_ref[:] = jnp.take(tbl_ref[:], idx_ref[:], axis=0)

    TILE = 2048

    @jax.jit
    def pallas_gather(tbl, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
            grid=(N // TILE,),
            in_specs=[
                pl.BlockSpec((TILE,), lambda i: (i,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((M, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(idx, tbl)

    try:
        out = pallas_gather(tbl, idx)
        ref = tbl[idx]
        err = float(jnp.abs(out - ref).max())
        print('pallas take err:', err)

        def body(i, c):
            r = pallas_gather(tbl, (idx + i) % M)
            return c + r.sum()
        mb = N * 128 * 4 / 1e6
        ms = dev_time(body, jnp.float32(0),
                      label=f'Pallas VMEM take [{M},128] ({mb:.0f} MB)')
        print(f'    -> {mb / ms:.1f} GB/s')
    except Exception as e:
        print('Pallas take failed:', type(e).__name__, str(e)[:500])


if __name__ == '__main__':
    main()
