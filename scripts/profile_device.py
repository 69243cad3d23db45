"""True device-time per component: run K repetitions inside ONE jit via
lax.fori_loop (no dispatch overhead), report ms per repetition.

Usage: python scripts/profile_device.py
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
    print(f'{label:45s} {ms:8.3f} ms/iter (device)')
    return ms


def main():
    import jax
    import jax.numpy as jnp

    from nice_slam_tpu.utils.compilation_cache import enable
    enable()
    jax.config.update('jax_default_matmul_precision', 'float32')

    from nice_slam_tpu.models.decoders import (
        DecoderConfig, init_nice_decoders, mlp_apply, nice_eval)
    from nice_slam_tpu.models.grids import (
        GridConfig, init_grids, round_bound, static_grid_shapes)
    from nice_slam_tpu.ops.trilinear import sample_grid_feature
    from nice_slam_tpu.render.renderer import (
        RenderConfig, SceneModel, render_rays)

    bound = round_bound([[-1.3, 7.4], [-3.1, 3.2], [-1.7, 2.3]], 0.32)
    gcfg = GridConfig(bound=bound)
    dcfg = DecoderConfig()
    rcfg = RenderConfig(n_samples=32, n_surface=16)
    model = SceneModel(kind='nice', decoder=dcfg,
                       bound=jnp.asarray(gcfg.bound_np),
                       coarse_bound=jnp.asarray(gcfg.coarse_bound_np),
                       grid_shapes=static_grid_shapes(gcfg))
    key = jax.random.PRNGKey(0)
    kg, kd, kp = jax.random.split(key, 3)
    grids = init_grids(kg, gcfg)
    params = init_nice_decoders(kd, dcfg)
    shapes = dict(model.grid_shapes)
    bnd = jnp.asarray(gcfg.bound_np)

    n_pts = 48000
    pts = jax.random.uniform(
        kp, (n_pts, 3),
        minval=jnp.asarray([b[0] for b in bound]),
        maxval=jnp.asarray([b[1] for b in bound]))

    # 1. trilinear fwd, fine grid
    def body(i, c):
        f = sample_grid_feature(grids['fine'], pts + i * 1e-6, bnd,
                                shapes['fine'])
        return c + f.sum()
    dev_time(body, jnp.float32(0), label='trilinear fwd fine 48k')

    # 2. trilinear fwd+bwd (scatter-add VJP)
    def body(i, c):
        def loss(g):
            return sample_grid_feature(g, pts + i * 1e-6, bnd,
                                       shapes['fine']).sum()
        gr = jax.grad(loss)(grids['fine'])
        return c + gr[0, 0]
    dev_time(body, jnp.float32(0), label='trilinear grad fine 48k (scatter)')

    # 3. MLP fwd alone (middle decoder on fixed features)
    feat = jax.random.normal(kp, (n_pts, 32))
    def body(i, c):
        o = mlp_apply(params['middle'], dcfg, pts + i * 1e-6, feat,
                      color=False)
        return c + o.sum()
    dev_time(body, jnp.float32(0), label='MLP fwd middle 48k')

    # 4. MLP fwd+bwd wrt params
    def body(i, c):
        def loss(pr):
            return mlp_apply(pr, dcfg, pts + i * 1e-6, feat,
                             color=False).sum()
        gr = jax.grad(loss)(params['middle'])
        return c + gr['out']['b'][0]
    dev_time(body, jnp.float32(0), label='MLP grad middle 48k')

    # 5. nice_eval color fwd
    def body(i, c):
        r = nice_eval(params, grids, pts + i * 1e-6, 'color', dcfg,
                      model.bound, model.coarse_bound, model.grid_shapes)
        return c + r.sum()
    dev_time(body, jnp.float32(0), label='nice_eval color fwd 48k')

    # 6. full render grad (the map-iteration core), 1000 rays
    n_rays = 1000
    ro = jnp.zeros((n_rays, 3)) + jnp.asarray([2.0, 0.0, 0.3])
    th = jnp.linspace(-0.5, 0.5, n_rays)
    rd = jnp.stack([jnp.sin(th), 0.1 * jnp.cos(3 * th), -jnp.cos(th)], -1)
    gtd = jnp.full((n_rays,), 1.5)

    def body(i, c):
        def loss(g, pc):
            pr = {**params, 'color': pc}
            d, v, col, _ = render_rays(pr, g, ro + i * 1e-6, rd,
                                       stage='color', model=model, rcfg=rcfg,
                                       gt_depth=gtd)
            return jnp.abs(gtd - d).sum() + jnp.abs(col - 0.5).sum()
        g1, g2 = jax.grad(loss, argnums=(0, 1))(grids, params['color'])
        return c + g1['fine'][0, 0] + g2['out']['b'][0]
    dev_time(body, jnp.float32(0), label='render grad color 1000 rays', k=20)

    # 6b. same but only decoder grads (no grid grads -> no scatter)
    def body(i, c):
        def loss(pc):
            pr = {**params, 'color': pc}
            d, v, col, _ = render_rays(pr, grids, ro + i * 1e-6, rd,
                                       stage='color', model=model, rcfg=rcfg,
                                       gt_depth=gtd)
            return jnp.abs(gtd - d).sum() + jnp.abs(col - 0.5).sum()
        g2 = jax.grad(loss)(params['color'])
        return c + g2['out']['b'][0]
    dev_time(body, jnp.float32(0), label='render grad color (no grid grads)',
             k=20)

    # 7. render fwd only
    def body(i, c):
        d, v, col, _ = render_rays(params, grids, ro + i * 1e-6, rd,
                                   stage='color', model=model, rcfg=rcfg,
                                   gt_depth=gtd)
        return c + d.sum()
    dev_time(body, jnp.float32(0), label='render fwd color 1000 rays', k=20)


if __name__ == '__main__':
    main()
