"""Prototype: can a Pallas per-row-DMA gather beat XLA's row gather?

BASELINE.md round-3 anatomy: the TUM tracking decode is ~50/50 between
the expanded-row gathers and the MLPs, and XLA's TPU row gather is bound
by a ~13-17 ns/row FIXED cost (not bytes, not locality).  VERDICT r3 #2
asks for an embedding-lookup-style kernel that batches the row loads.

This measures, on the real chip, rows/s for:
  * XLA `table[idx]` (the current trilinear_interp_expanded path);
  * a Pallas kernel that issues one async HBM->VMEM DMA per row with a
    deep in-flight ring (the scalar core issues descriptors while the
    DMA engines drain them);

Timing uses the value-fetch barrier + in-program repetition methodology
(BASELINE.md measurement hazards).

Usage: python scripts/studies/proto_pallas_gather.py [n_points] [row_c]
"""

import functools
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


def pallas_gather_rows(table, idx, *, chunk=2048, nsem=16):
    """out[i] = table[idx[i]] via per-row DMAs with an in-flight ring."""
    n = idx.shape[0]
    row = table.shape[1]
    assert n % chunk == 0

    def kernel(idx_ref, table_ref, out_ref, sems):
        def dma(j, slot):
            return pltpu.make_async_copy(
                table_ref.at[idx_ref[j]], out_ref.at[j], sems.at[slot])

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

    grid = (n // chunk,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((chunk,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((chunk, row), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, row), table.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((nsem,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx, table)


def bench(fn, make_args, n_rep=50, label=''):
    """Amortized in-program repetition with a value-fetch barrier."""
    args = make_args()

    def rep_fn(*a):
        def body(i, acc):
            out = fn(*a)
            return acc + out.ravel()[0] + jnp.float32(i) * 0.0
        return jax.lax.fori_loop(0, n_rep, body, jnp.float32(0.0))

    jfn = jax.jit(rep_fn)
    float(jfn(*args))   # compile + warm

    tiny = jnp.zeros((8,))
    tiny_fn = jax.jit(lambda v: jnp.sum(v) * 0.0)
    float(tiny_fn(tiny))
    fetch_s = min(_timed(lambda: float(tiny_fn(tiny))) for _ in range(5))

    wall = min(_timed(lambda: float(jfn(*args))) for _ in range(3))
    per_call = max((wall - fetch_s) / n_rep, 1e-9)
    return per_call


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 240 * 1024
    c8 = int(sys.argv[2]) if len(sys.argv) > 2 else 256   # floats per row
    n_rows = 59 * 1024   # ~TUM fine volume
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((n_rows, c8)), jnp.float32)
    # realistic indices: sorted runs of ~48 (per-ray monotone voxel walk)
    base = rng.integers(0, n_rows - 64, size=(n // 48,))
    walk = np.sort(rng.integers(0, 64, size=(n // 48, 48)), axis=1)
    idx_np = (base[:, None] + walk).reshape(-1).astype(np.int32)
    idx = jnp.asarray(idx_np)

    print(f'n={n} rows of {c8} f32 ({n * c8 * 4 / 1e6:.0f} MB gathered), '
          f'table {n_rows}x{c8} ({n_rows * c8 * 4 / 1e6:.0f} MB)')

    # XLA baseline
    t = bench(lambda tab, ii: tab[ii], lambda: (table, idx), n_rep=20)
    print(f'XLA gather:     {t * 1e3:7.3f} ms  {t / n * 1e9:6.2f} ns/row '
          f'{n * c8 * 4 / t / 1e9:6.1f} GB/s')

    # Pallas ring-DMA
    for nsem in (8, 16, 32):
        for chunk in (1024, 4096):
            try:
                f = functools.partial(pallas_gather_rows, chunk=chunk,
                                      nsem=nsem)
                # correctness first
                out = f(table, idx[:chunk * 2])
                ref = np.asarray(table)[idx_np[:chunk * 2]]
                ok = np.array_equal(np.asarray(out), ref)
                t = bench(f, lambda: (table, idx), n_rep=20)
                print(f'Pallas ring nsem={nsem:3d} chunk={chunk:5d}: '
                      f'{t * 1e3:7.3f} ms  {t / n * 1e9:6.2f} ns/row '
                      f'{n * c8 * 4 / t / 1e9:6.1f} GB/s  ok={ok}')
            except Exception as e:
                print(f'Pallas nsem={nsem} chunk={chunk}: FAILED '
                      f'{type(e).__name__}: {str(e)[:200]}')


if __name__ == '__main__':
    main()
