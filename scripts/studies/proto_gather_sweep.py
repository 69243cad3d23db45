"""Measure the TPU row-gather cost structure to pick the gather design.

Questions (VERDICT r3 #2 groundwork):
  1. XLA `table[idx]`: how does ns/row scale with ROW SIZE?  If cost is
     ~flat, merging the two tracking gathers (middle 256f + finecolor
     512f) into ONE fat-row gather halves the per-row spend.
  2. Pallas per-descriptor DMA at tile granularity (1024 f32 = one
     (8,128) tile, the Mosaic slicing floor): what is the descriptor
     issue floor?  (Sub-tile rows cannot be DMA'd: "Slice shape along
     dimension 0 must be aligned to tiling".)

Methodology: in-program fori_loop repetition + value-fetch barrier with
fetch baseline subtracted (BASELINE.md measurement hazards).

Usage: python scripts/studies/proto_gather_sweep.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def bench_loop(build_step, n_rep=30):
    """build_step(i) -> scalar; amortized over n_rep in-program reps."""
    def rep_fn():
        def body(i, acc):
            return acc + build_step(i)
        return jax.lax.fori_loop(0, n_rep, body, jnp.float32(0.0))

    jfn = jax.jit(rep_fn)
    float(jfn())   # compile + warm

    tiny = jnp.zeros((8,))
    tiny_fn = jax.jit(lambda v: jnp.sum(v) * 0.0)
    float(tiny_fn(tiny))
    fetch_s = min(_timed(lambda: float(tiny_fn(tiny))) for _ in range(5))
    wall = min(_timed(lambda: float(jfn())) for _ in range(3))
    return max((wall - fetch_s) / n_rep, 1e-9)


def pallas_gather_tiles(table_flat, idx, row, *, chunk=1024, nsem=16):
    """out[j] = table_flat[idx[j]*row : +row], row a multiple of 1024."""
    n = idx.shape[0]

    def kernel(idx_ref, table_ref, out_ref, sems):
        def dma(j, slot):
            return pltpu.make_async_copy(
                table_ref.at[pl.ds(idx_ref[j] * row, row)],
                out_ref.at[pl.ds(j * row, row)], sems.at[slot])

        def start(j, _):
            dma(j, j % nsem).start()
            return 0
        jax.lax.fori_loop(0, nsem, start, 0)

        def body(j, _):
            dma(j - nsem, j % nsem).wait()
            dma(j, j % nsem).start()
            return 0
        jax.lax.fori_loop(nsem, chunk, body, 0)

        def drain(j, _):
            dma(j, j % nsem).wait()
            return 0
        jax.lax.fori_loop(chunk - nsem, chunk, drain, 0)

    out = pl.pallas_call(
        kernel,
        grid=(n // chunk,),
        in_specs=[
            pl.BlockSpec((chunk,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((chunk * row,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n * row,), table_flat.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((nsem,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx, table_flat)
    return out


def main():
    n = 96 * 1024
    rng = np.random.default_rng(0)

    print('--- XLA gather: ns/row vs row floats (table ~60MB) ---')
    for row in (64, 128, 256, 512, 1024, 1536, 2048):
        n_rows = max(60 * 1024 * 1024 // (row * 4), 1024)
        table = jnp.asarray(
            rng.standard_normal((n_rows, row)), jnp.float32)
        idx = jnp.asarray(
            rng.integers(0, n_rows, size=n).astype(np.int32))

        def step(i, table=table, idx=idx):
            ii = (idx + i) % table.shape[0]   # defeat CSE
            return table[ii].ravel()[0]

        t = bench_loop(step, n_rep=20)
        print(f'row={row:5d} f32: {t * 1e3:7.3f} ms   '
              f'{t / n * 1e9:6.2f} ns/row   '
              f'{n * row * 4 / t / 1e9:6.1f} GB/s')

    print('--- Pallas tile DMA (row=1024 f32 = 1 tile) ---')
    row = 1024
    n_rows = 60 * 1024 * 1024 // (row * 4)
    table = jnp.asarray(
        rng.standard_normal((n_rows * row,)), jnp.float32)
    idx_np = rng.integers(0, n_rows, size=n).astype(np.int32)
    idx = jnp.asarray(idx_np)

    # correctness once
    out = pallas_gather_tiles(table, idx[:2048], row, chunk=1024, nsem=16)
    ref = np.asarray(table).reshape(n_rows, row)[idx_np[:2048]].ravel()
    print('correct:', np.array_equal(np.asarray(out), ref))

    for nsem in (8, 16, 32):
        def step(i, idx=idx, nsem=nsem):
            ii = (idx + i) % n_rows
            return pallas_gather_tiles(table, ii, row,
                                       chunk=2048, nsem=nsem).ravel()[0]
        try:
            t = bench_loop(step, n_rep=10)
            print(f'pallas nsem={nsem:3d}: {t * 1e3:7.3f} ms   '
                  f'{t / n * 1e9:6.2f} ns/desc   '
                  f'{n * row * 4 / t / 1e9:6.1f} GB/s')
        except Exception as e:
            print(f'pallas nsem={nsem}: FAILED {type(e).__name__}: '
                  f'{str(e)[:160]}')


if __name__ == '__main__':
    main()
