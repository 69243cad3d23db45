"""Fused Pallas decoder kernel vs plain XLA on the mesher's lattice query.

Times the exact eval_field computation (lax.map over fixed-size chunks of
the 256^3 = 16.7M-point lattice, fine stage) with model.fused_eval on and
off, on the current default device.  VERDICT r1 item #4: wire the kernel
and record the measured delta.

Usage: python scripts/bench_fused_eval.py [resolution]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 256

    import jax
    import jax.numpy as jnp
    from jax import lax

    from nice_slam_tpu.utils.compilation_cache import enable
    enable()
    jax.config.update('jax_default_matmul_precision', 'float32')

    from nice_slam_tpu.models.grids import prepare_grids
    from nice_slam_tpu.render.renderer import eval_raw
    import __graft_entry__ as g

    model, rcfg, gcfg, grids, params, key = g._tiny_setup()
    n = res ** 3
    chunk = 262144
    nc = -(-n // chunk)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (nc * chunk, 3)).astype(np.float32)
    pts3 = jnp.asarray(pts.reshape(nc, chunk, 3))
    grids_p = prepare_grids(grids, model.grid_shapes, stage='fine') \
        if model.expanded else grids

    for fused in (False, True):
        m = model._replace(fused_eval=fused)

        @jax.jit
        def run(params, grids, pts3, m=m):
            def one(p):
                return eval_raw(params, grids, p, 'fine', m)[:, 3]
            return lax.map(one, pts3)

        out = run(params, grids_p, pts3)
        jax.block_until_ready(out)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run(params, grids_p, pts3))
            ts.append(time.perf_counter() - t0)
        label = 'fused-pallas' if fused else 'xla'
        print(f'{label}: {res}^3 fine-stage query ({n/1e6:.1f}M pts) in '
              f'{min(ts):.3f} s = {n / min(ts) / 1e6:.0f}M pts/s')


if __name__ == '__main__':
    main()
