"""Expansion-kernel roofline: close or explain (VERDICT r3 #4).

The corner-expansion sustains ~360-380 GB/s = 0.44-0.47 of the v5e's
819 GB/s HBM peak (BENCH_r03), and the orchestrator's autotune accepts
at a hard-coded 0.45*peak.  This measures what THIS stack can actually
sustain on same-shape pure streaming, so the threshold can be derived
from a measured bound instead of a guess:

  xla_copy      y = x * 1.0000001 on the 8C expanded-size buffer
                (one read + one write of the large buffer)
  xla_widen     out[M, 8C] = tile(x[M, C]) (read C, write 8C — the
                expand's exact traffic ratio, no neighbor shifts)
  pallas_copy   pass-through pallas kernel, same grid/block structure
                as the expand kernel (x-plane grid, VMEM blocks)
  expand        the shipped expansion kernel

All timed with in-program repetition + value-fetch barrier.  Bandwidth
figures count bytes-moved = read + written.

Usage: python scripts/studies/proto_expand_roofline.py [nx ny nz c]
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

HBM_PEAK = 819.0


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def bench(step, nbytes, n_rep=50, label=''):
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
    gbps = nbytes / t / 1e9
    print(f'{label:12s} {t * 1e3:8.3f} ms  {gbps:6.1f} GB/s '
          f'({gbps / HBM_PEAK:.2f} peak)', flush=True)
    return gbps


def main():
    nx, ny, nz, c = (int(a) for a in (sys.argv[1:5] or [28, 21, 14, 32]))
    rng = np.random.default_rng(0)
    grid = jnp.asarray(rng.standard_normal((nx * ny * nz, c)), jnp.float32)
    big = jnp.asarray(
        rng.standard_normal((nx * ny * nz, 8 * c)), jnp.float32)
    print(f'grid {nx}x{ny}x{nz} c={c}: in '
          f'{grid.nbytes / 1e6:.0f} MB, out {big.nbytes / 1e6:.0f} MB')

    # 1. XLA pure copy of the big buffer (read big + write big)
    bench(lambda i: (big * (1.0 + i * 1e-12)).ravel()[0],
          2 * big.nbytes, label='xla_copy')

    # 2. XLA widen: read C write 8C (expand's traffic, no shifts)
    bench(lambda i: jnp.tile(grid * (1.0 + i * 1e-12), (1, 8)).ravel()[0],
          grid.nbytes + big.nbytes, label='xla_widen')

    # 3. pallas pass-through with the expand kernel's plane-grid shape:
    #    grid over x-planes, whole (ny*nz, 8C) blocks in VMEM
    def copy_kernel(in_ref, out_ref):
        out_ref[:] = in_ref[:] * 1.0

    def pallas_copy(x):
        return pl.pallas_call(
            copy_kernel,
            grid=(nx,),
            in_specs=[pl.BlockSpec((ny * nz, 8 * c), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((ny * nz, 8 * c), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nx * ny * nz, 8 * c),
                                           x.dtype),
        )(x)

    bench(lambda i: pallas_copy(big * (1.0 + i * 1e-12)).ravel()[0],
          4 * big.nbytes, label='pallas_copy')
    # NOTE: the perturb multiply adds one read+write of big; bytes counts
    # it (2 for the multiply + 2 for the kernel)

    # 4. the shipped expansion kernel (read C, write 8C per stage volume)
    from nice_slam_tpu.ops.pallas.expand import (expand_grid_pallas,
                                                 pallas_expand_ok)
    if pallas_expand_ok((nx, ny, nz), c):
        def ex(i):
            g = grid * (1.0 + i * 1e-12)
            return expand_grid_pallas(g, (nx, ny, nz)).ravel()[0]
        # bytes: perturb (2*grid) + expand read grid + write big
        bench(ex, 3 * grid.nbytes + big.nbytes, label='expand')
    else:
        print('expand: shape not kernel-eligible')


if __name__ == '__main__' and not any(a.startswith('--variant') for a in sys.argv):
    main()


def variants(nx, ny, nz, c):
    """Pinpoint the expand kernel's bottleneck: same plane-grid structure,
    (a) concat 8 copies (no shifts), (b) shifts only (no 8x concat),
    (c) full expand body."""
    import numpy as np
    rng = np.random.default_rng(1)
    grid = jnp.asarray(rng.standard_normal((nx, ny * nz, c)), jnp.float32)
    from nice_slam_tpu.ops.pallas.expand import (_plane_masks, _shift_up)
    masks = jnp.asarray(_plane_masks(ny, nz))

    def mk(body, out_c):
        def kernel(cur_ref, mask_ref, out_ref):
            out_ref[0] = body(cur_ref[0], mask_ref)
        def run(x):
            return pl.pallas_call(
                kernel,
                grid=(nx,),
                in_specs=[
                    pl.BlockSpec((1, ny * nz, c), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((ny * nz, 2), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, ny * nz, out_c),
                                       lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((nx, ny * nz, out_c),
                                               x.dtype),
            )(x, masks)
        return run

    def concat8(cur, mask_ref):
        return jnp.concatenate([cur] * 8, axis=-1)

    def shifts_only(cur, mask_ref):
        zlast = mask_ref[:, 0:1]
        ylast = mask_ref[:, 1:2]
        a = jnp.where(zlast > 0, cur, _shift_up(cur, 1))
        b = jnp.where(ylast > 0, cur, _shift_up(cur, nz))
        return a + b

    def full(cur, mask_ref):
        zlast = mask_ref[:, 0:1]
        ylast = mask_ref[:, 1:2]
        sz = lambda v: jnp.where(zlast > 0, v, _shift_up(v, 1))
        sy = lambda v: jnp.where(ylast > 0, v, _shift_up(v, nz))
        blocks = []
        for base in (cur, cur):
            for by in (base, sy(base)):
                blocks.append(by)
                blocks.append(sz(by))
        return jnp.concatenate(blocks, axis=-1)

    inb = grid.nbytes
    for label, body, out_c, nbytes in (
            ('k_concat8', concat8, 8 * c, 3 * inb + 8 * inb),
            ('k_shifts', shifts_only, c, 3 * inb + inb),
            ('k_full', full, 8 * c, 3 * inb + 8 * inb)):
        run = mk(body, out_c)
        bench(lambda i, run=run: run(
            grid * (1.0 + i * 1e-12)).ravel()[0], nbytes, label=label)


if __name__ == '__main__' and '--variants' in sys.argv and '--variants2' not in sys.argv:
    variants(64, 48, 40, 32)


def variants2(nx, ny, nz, c):
    """Store variant: write the 8 corner blocks as direct channel-slice
    stores instead of one big concatenate, and the real 2-plane read."""
    import numpy as np
    rng = np.random.default_rng(1)
    grid = jnp.asarray(rng.standard_normal((nx, ny * nz, c)), jnp.float32)
    from nice_slam_tpu.ops.pallas.expand import _plane_masks, _shift_up
    masks = jnp.asarray(_plane_masks(ny, nz))

    def kernel(cur_ref, nxt_ref, mask_ref, out_ref):
        cur = cur_ref[0]
        nxt = nxt_ref[0]
        zlast = mask_ref[:, 0:1]
        ylast = mask_ref[:, 1:2]
        sz = lambda v: jnp.where(zlast > 0, v, _shift_up(v, 1))
        sy = lambda v: jnp.where(ylast > 0, v, _shift_up(v, nz))
        k = 0
        for base in (cur, nxt):
            for by in (base, sy(base)):
                out_ref[0, :, k * c:(k + 1) * c] = by
                out_ref[0, :, (k + 1) * c:(k + 2) * c] = sz(by)
                k += 2

    def run(x):
        return pl.pallas_call(
            kernel,
            grid=(nx,),
            in_specs=[
                pl.BlockSpec((1, ny * nz, c), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ny * nz, c),
                             lambda i: (jnp.minimum(i + 1, nx - 1), 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ny * nz, 2), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, ny * nz, 8 * c),
                                   lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nx, ny * nz, 8 * c), x.dtype),
        )(x, x, masks)

    inb = grid.nbytes
    bench(lambda i: run(grid * (1.0 + i * 1e-12)).ravel()[0],
          3 * inb + inb + 8 * inb, label='k_slicestore')


if __name__ == '__main__' and '--variants2' in sys.argv:
    variants2(64, 48, 40, 32)
