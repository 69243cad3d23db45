"""Which sorted-merge formulation is fastest on TPU at [1000 rays, 32+16]?

  (1) jnp.sort(concat)            -- the baseline sorting network
  (2) rank + lane scatter          -- .at[rows, pos].set
  (3) rank + one-hot matmul        -- out = einsum(vals, onehot(pos))
  (4) rank + take_along_axis(inv via one-hot iota matmul)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 50


def dev_time(body, label, k=K):
    import jax
    from jax import lax
    import jax.numpy as jnp

    @jax.jit
    def run():
        def f(i, c):
            return c + body(i)
        return lax.fori_loop(0, k, f, jnp.float32(0))

    jax.block_until_ready(run())
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run())
        best = min(best, time.perf_counter() - t0)
    print(f'{label:40s} {best / k * 1e3:8.3f} ms/iter')


def main():
    import jax
    import jax.numpy as jnp

    from nice_slam_tpu.utils.compilation_cache import enable
    enable()

    key = jax.random.PRNGKey(0)
    n, sa, sb = 1000, 32, 16
    ka, kb = jax.random.split(key)
    a = jnp.sort(jax.random.uniform(ka, (n, sa)), axis=-1)
    b = jnp.sort(jax.random.uniform(kb, (n, sb)), axis=-1)

    def ranks(a, b):
        pos_a = jnp.arange(sa) + jnp.sum(
            b[..., None, :] < a[..., :, None], axis=-1)
        pos_b = jnp.arange(sb) + jnp.sum(
            a[..., None, :] <= b[..., :, None], axis=-1)
        return jnp.concatenate([pos_a, pos_b], -1)

    def v1(i):
        return jnp.sort(jnp.concatenate([a + i, b + i], -1), -1).sum()

    def v2(i):
        aa, bb = a + i, b + i
        vals = jnp.concatenate([aa, bb], -1)
        pos = ranks(aa, bb)
        rows = jnp.arange(n)[:, None]
        return jnp.zeros_like(vals).at[rows, pos].set(vals).sum()

    def v3(i):
        aa, bb = a + i, b + i
        vals = jnp.concatenate([aa, bb], -1)
        pos = ranks(aa, bb)
        oh = (pos[..., :, None] == jnp.arange(sa + sb)).astype(vals.dtype)
        return jnp.einsum('ns,nsk->nk', vals, oh).sum()

    def v4(i):
        aa, bb = a + i, b + i
        vals = jnp.concatenate([aa, bb], -1)
        pos = ranks(aa, bb)
        oh = (pos[..., :, None] == jnp.arange(sa + sb))
        inv = jnp.argmax(oh, axis=-2)  # [n, S] inverse permutation
        return jnp.take_along_axis(vals, inv, -1).sum()

    # correctness
    want = jnp.sort(jnp.concatenate([a, b], -1), -1)
    for name, f in (('v2', v2), ('v3', v3), ('v4', v4)):
        got_fn = {
            'v2': lambda: v2, 'v3': lambda: v3, 'v4': lambda: v4}[name]()
        # recompute merged array for check
    def merged_v3():
        vals = jnp.concatenate([a, b], -1)
        pos = ranks(a, b)
        oh = (pos[..., :, None] == jnp.arange(sa + sb)).astype(vals.dtype)
        return jnp.einsum('ns,nsk->nk', vals, oh)
    def merged_v4():
        vals = jnp.concatenate([a, b], -1)
        pos = ranks(a, b)
        oh = (pos[..., :, None] == jnp.arange(sa + sb))
        inv = jnp.argmax(oh, axis=-2)
        return jnp.take_along_axis(vals, inv, -1)
    print('v3 err', float(jnp.abs(merged_v3() - want).max()))
    print('v4 err', float(jnp.abs(merged_v4() - want).max()))

    dev_time(v1, '(1) jnp.sort(concat) 48 lanes')
    dev_time(v2, '(2) rank + lane scatter')
    dev_time(v3, '(3) rank + one-hot matmul')
    dev_time(v4, '(4) rank + argmax-inv + take_along')

    # same at tracking scale (200 rays)
    a2, b2 = a[:200], b[:200]
    def v1t(i):
        return jnp.sort(jnp.concatenate([a2 + i, b2 + i], -1), -1).sum()
    def v3t(i):
        aa, bb = a2 + i, b2 + i
        vals = jnp.concatenate([aa, bb], -1)
        pos_a = jnp.arange(sa) + jnp.sum(
            bb[..., None, :] < aa[..., :, None], axis=-1)
        pos_b = jnp.arange(sb) + jnp.sum(
            aa[..., None, :] <= bb[..., :, None], axis=-1)
        pos = jnp.concatenate([pos_a, pos_b], -1)
        oh = (pos[..., :, None] == jnp.arange(sa + sb)).astype(vals.dtype)
        return jnp.einsum('ns,nsk->nk', vals, oh).sum()
    dev_time(v1t, '(1) sort, 200 rays')
    dev_time(v3t, '(3) one-hot matmul, 200 rays')


if __name__ == '__main__':
    main()
