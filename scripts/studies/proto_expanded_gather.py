"""Prototype: expanded-corner grid layout for trilinear interpolation.

Idea: precompute E[m] = concat_{(di,dj,dk) in {0,1}^3} G[clamp(i+di), ...]
so each query point gathers ONE row of 8C floats instead of 8 rows of C.
TPU gathers pay per row, so 8x fewer rows; rows become 256 f32 lanes
(1 KB) which use full lane width.  The expansion is dense (slice+concat,
built once per optimization iteration inside the jit); its transpose (the
gradient fold-back) is a dense shifted-add, so the scatter-add VJP also
shrinks to one 48k-row scatter.

Measures device time via fori_loop against the baseline gather.
"""
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
    print(f'{label:50s} {ms:8.3f} ms/iter (device)')
    return ms


def main():
    import jax
    import jax.numpy as jnp

    from nice_slam_tpu.utils.compilation_cache import enable
    enable()
    jax.config.update('jax_default_matmul_precision', 'float32')

    from nice_slam_tpu.models.grids import GridConfig, round_bound
    from nice_slam_tpu.ops.trilinear import sample_grid_feature

    bound = round_bound([[-1.3, 7.4], [-3.1, 3.2], [-1.7, 2.3]], 0.32)
    gcfg = GridConfig(bound=bound)
    nx, ny, nz, C = 56, 40, 26, 32
    key = jax.random.PRNGKey(0)
    kg, kp = jax.random.split(key)
    G = jax.random.normal(kg, (nx * ny * nz, C)) * 0.01
    bnd = jnp.asarray(gcfg.bound_np)

    n_pts = 48000
    pts = jax.random.uniform(
        kp, (n_pts, 3),
        minval=jnp.asarray([b[0] for b in bound]),
        maxval=jnp.asarray([b[1] for b in bound]))

    # ---------------- expanded layout ----------------
    def expand(G):
        """[M, C] -> [M, 8C]: corner (di,dj,dk) block at offset
        ((di*2+dj)*2+dk)*C, edge-clamped."""
        g = G.reshape(nx, ny, nz, C)
        blocks = []
        for di in (0, 1):
            gx = g if di == 0 else jnp.concatenate(
                [g[1:], g[-1:]], axis=0)
            for dj in (0, 1):
                gy = gx if dj == 0 else jnp.concatenate(
                    [gx[:, 1:], gx[:, -1:]], axis=1)
                for dk in (0, 1):
                    gz = gy if dk == 0 else jnp.concatenate(
                        [gy[:, :, 1:], gy[:, :, -1:]], axis=2)
                    blocks.append(gz)
        return jnp.concatenate(blocks, axis=-1).reshape(nx * ny * nz, 8 * C)

    def interp_expanded(E, p):
        """Trilinear interp from the expanded grid, border padding,
        align_corners=True."""
        lo, hi = bnd[:, 0], bnd[:, 1]
        p_nor = (p - lo) / (hi - lo) * 2.0 - 1.0
        sizes = jnp.array([nx, ny, nz], dtype=p_nor.dtype)
        idx = (p_nor + 1.0) * 0.5 * (sizes - 1.0)
        idx = jnp.clip(idx, 0.0, sizes - 1.0)
        i0 = jnp.floor(idx)
        frac = idx - i0
        i0 = i0.astype(jnp.int32)
        m = (i0[:, 0] * ny + i0[:, 1]) * nz + i0[:, 2]
        rows = E[m]                       # [N, 8C] one gather
        rows = rows.reshape(-1, 2, 2, 2, C)
        fx, fy, fz = (frac[:, a].reshape(-1, 1, 1, 1, 1) for a in (0, 1, 2))
        w = (jnp.concatenate([1 - fx, fx], axis=1)
             * jnp.concatenate([1 - fy, fy], axis=2)
             * jnp.concatenate([1 - fz, fz], axis=3))
        return (rows * w).sum(axis=(1, 2, 3))

    # correctness vs baseline
    ref = sample_grid_feature(G, pts, bnd, (nx, ny, nz))
    E = expand(G)
    new = interp_expanded(E, pts)
    err = float(jnp.abs(ref - new).max())
    print('max abs diff vs baseline:', err)
    assert err < 1e-5

    # grad correctness
    g_ref = jax.grad(lambda G: sample_grid_feature(
        G, pts, bnd, (nx, ny, nz)).sum())(G)
    g_new = jax.grad(lambda G: interp_expanded(expand(G), pts).sum())(G)
    gerr = float(jnp.abs(g_ref - g_new).max())
    print('max abs grad diff:', gerr)
    assert gerr < 1e-4

    # ---------------- timings ----------------
    def body(i, c):
        f = sample_grid_feature(G, pts + i * 1e-6, bnd, (nx, ny, nz))
        return c + f.sum()
    dev_time(body, jnp.float32(0), label='baseline gather fwd 48k')

    def body(i, c):
        f = interp_expanded(E, pts + i * 1e-6)  # E prebuilt (fwd-only case)
        return c + f.sum()
    dev_time(body, jnp.float32(0), label='expanded gather fwd 48k (E cached)')

    def body(i, c):
        f = interp_expanded(expand(G + c * 0), pts + i * 1e-6)
        return c + f.sum()
    dev_time(body, jnp.float32(0), label='expanded fwd incl. expand()')

    def body(i, c):
        gr = jax.grad(lambda G: sample_grid_feature(
            G, pts + i * 1e-6, bnd, (nx, ny, nz)).sum())(G)
        return c + gr[0, 0]
    dev_time(body, jnp.float32(0), label='baseline grad (scatter)')

    def body(i, c):
        gr = jax.grad(lambda G: interp_expanded(
            expand(G), pts + i * 1e-6).sum())(G)
        return c + gr[0, 0]
    dev_time(body, jnp.float32(0), label='expanded grad (scatter+fold)')

    # 3-grid color-stage shape: middle + fine + color via ONE finecolor buf
    Gm = jax.random.normal(kg, (28 * 20 * 13, C)) * 0.01
    # (skip: structure identical, scaling is linear in rows)


if __name__ == '__main__':
    main()
