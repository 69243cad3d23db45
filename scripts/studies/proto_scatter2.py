"""Scatter-add cost, with forced serialization via loop-carried dependence."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 30


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from nice_slam_tpu.utils.compilation_cache import enable
    enable()

    key = jax.random.PRNGKey(0)
    M, N = 58240, 48000
    kg, ki = jax.random.split(key)
    idx = jax.random.randint(ki, (N,), 0, M)

    def bench(width, n_scat, label, n_rows=N):
        upd = jax.random.normal(kg, (n_scat, n_rows, width))

        @jax.jit
        def run(c0):
            def body(i, c):
                acc = jnp.zeros((M, width))
                for j in range(n_scat):
                    acc = acc.at[(idx[:n_rows] + i + j) % M].add(
                        upd[j] + c * 1e-30)
                return acc.ravel()[::4097].sum()
            return lax.fori_loop(0, K, body, c0)

        c = run(jnp.float32(0))
        jax.block_until_ready(c)
        t0 = time.perf_counter()
        c = run(jnp.float32(0))
        jax.block_until_ready(c)
        ms = (time.perf_counter() - t0) / K * 1e3
        rows = n_scat * n_rows
        print(f'{label:48s} {ms:8.3f} ms  ({ms*1e6/rows:.1f} ns/row)')

    bench(32, 8, '8 x scatter 48k rows of 32')
    bench(256, 1, '1 x scatter 48k rows of 256')
    bench(512, 1, '1 x scatter 48k rows of 512')
    bench(32, 1, '1 x scatter 48k rows of 32')

    # gather reference on same machine for the ratio
    tbl = jax.random.normal(kg, (M, 256))

    @jax.jit
    def g(c0):
        def body(i, c):
            r = tbl[(idx + i) % M]
            return c + r.sum()
        return lax.fori_loop(0, K, body, c0)
    c = g(jnp.float32(0)); jax.block_until_ready(c)
    t0 = time.perf_counter(); c = g(jnp.float32(0)); jax.block_until_ready(c)
    ms = (time.perf_counter() - t0) / K * 1e3
    print(f'{"gather 48k rows of 256":48s} {ms:8.3f} ms  '
          f'({ms*1e6/N:.1f} ns/row)')


if __name__ == '__main__':
    main()
