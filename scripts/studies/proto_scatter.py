"""Scatter-add cost model on this TPU.

Variants:
  (1) XLA scatter-add, 8x48k rows of 32 (baseline VJP shape)
  (2) XLA scatter-add, 48k rows of 256 (expanded layout VJP)
  (3) XLA scatter-add, 48k rows of 512
  (4) sort + segment-boundary sum + unique-rows scatter
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 30


def dev_time(fn, *args, k=K, label=''):
    import jax
    from jax import lax

    @jax.jit
    def run(c, *a):
        def body(i, c):
            return c + fn(*a, i)
        return lax.fori_loop(0, k, body, c)

    c = run(jnp_f32(0), *args)
    jax.block_until_ready(c)
    t0 = time.perf_counter()
    c = run(jnp_f32(0), *args)
    jax.block_until_ready(c)
    ms = (time.perf_counter() - t0) / k * 1e3
    print(f'{label:55s} {ms:8.3f} ms/iter')
    return ms


def jnp_f32(x):
    import jax.numpy as jnp
    return jnp.float32(x)


def main():
    import jax
    import jax.numpy as jnp

    from nice_slam_tpu.utils.compilation_cache import enable
    enable()

    key = jax.random.PRNGKey(0)
    M, N = 58240, 48000
    kg, ki = jax.random.split(key)
    idx = jax.random.randint(ki, (N,), 0, M)

    # (1) 8 narrow scatters
    upd32 = jax.random.normal(kg, (8, N, 32))

    def f1(idx, upd32, i):
        acc = jnp.zeros((M, 32))
        for j in range(8):
            acc = acc.at[(idx + i + j) % M].add(upd32[j])
        return (acc * acc).sum()
    dev_time(f1, idx, upd32, label='(1) 8 x scatter-add 48k rows of 32')

    # (2) one scatter of 256-wide rows
    upd256 = jax.random.normal(kg, (N, 256))

    def f2(idx, upd, i):
        acc = jnp.zeros((M, 256))
        acc = acc.at[(idx + i) % M].add(upd)
        return (acc * acc).sum()
    dev_time(f2, idx, upd256, label='(2) scatter-add 48k rows of 256')

    # (3) 512-wide
    upd512 = jax.random.normal(kg, (N, 512))

    def f3(idx, upd, i):
        acc = jnp.zeros((M, 512))
        acc = acc.at[(idx + i) % M].add(upd)
        return (acc * acc).sum()
    dev_time(f3, idx, upd512, label='(3) scatter-add 48k rows of 512')

    # (4) sort + segment sum + scatter(unique)
    def f4(idx, upd, i):
        ids = (idx + i) % M
        order = jnp.argsort(ids)
        ids_s = ids[order]
        upd_s = upd[order]                     # gather permute
        seg = jnp.concatenate([jnp.ones((1,), bool),
                               ids_s[1:] != ids_s[:-1]])
        csum = jnp.cumsum(upd_s, axis=0)
        # sum per segment = csum at segment end - csum before segment start
        is_end = jnp.concatenate([ids_s[1:] != ids_s[:-1],
                                  jnp.ones((1,), bool)])
        # scatter end-values at their ids, subtract shifted
        end_csum = jnp.where(is_end[:, None], csum, 0.0)
        acc = jnp.zeros((M, upd.shape[1]))
        acc = acc.at[ids_s].add(end_csum)      # still a scatter but unique-ish
        return (acc * acc).sum()
    dev_time(f4, idx, upd256, label='(4) sort+cumsum+scatter 256 (approx)')

    # (5) scatter with mode/unique hints via segment_sum on sorted ids
    def f5(idx, upd, i):
        ids = (idx + i) % M
        order = jnp.argsort(ids)
        ids_s = ids[order]
        upd_s = upd[order]
        acc = jax.ops.segment_sum(upd_s, ids_s, num_segments=M,
                                  indices_are_sorted=True)
        return (acc * acc).sum()
    dev_time(f5, idx, upd256, label='(5) sort + segment_sum(sorted) 256')

    # (6) pure sort cost
    def f6(idx, upd, i):
        ids = (idx + i) % M
        order = jnp.argsort(ids)
        return order[0].astype(jnp.float32)
    dev_time(f6, idx, upd256, label='(6) argsort 48k i32 alone')


if __name__ == '__main__':
    main()
