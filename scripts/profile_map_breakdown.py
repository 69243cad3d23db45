"""Ablation breakdown of one mapping gradient iteration, DEVICE time.

Each piece runs K iterations inside one jitted fori_loop (carrying a
scalar that consumes the output) so per-call host/tunnel dispatch latency
(~25 ms on the axon stack) is amortized away; reported ms are per-iter
device time at the Replica mapping budget (1000 rays x 48 samples, color
stage, expanded grids).

Usage: python scripts/profile_map_breakdown.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 30


def dev_time(body, label, k=K):
    """body(i) -> scalar contribution; returns per-iter ms of device time."""
    import jax
    from jax import lax
    import jax.numpy as jnp

    @jax.jit
    def run():
        def f(i, c):
            return c + body(i)
        return lax.fori_loop(0, k, f, jnp.float32(0))

    c = run()
    jax.block_until_ready(c)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run())
        best = min(best, time.perf_counter() - t0)
    ms = best / k * 1e3
    print(f'{label:42s} {ms:8.3f} ms/iter')
    return ms


def main():
    import jax
    import jax.numpy as jnp

    from nice_slam_tpu.utils.compilation_cache import enable
    enable()
    jax.config.update('jax_default_matmul_precision', 'float32')

    from nice_slam_tpu.models.decoders import (
        DecoderConfig, init_nice_decoders, nice_eval)
    from nice_slam_tpu.models.grids import (
        GridConfig, init_grids, prepare_grids, round_bound,
        static_grid_shapes)
    from nice_slam_tpu.render.renderer import (
        RenderConfig, SceneModel, _z_values, render_rays)

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
    shapes_t = model.grid_shapes

    n_rays, s = 1000, 48
    ro = jnp.zeros((n_rays, 3)) + jnp.asarray([2.0, 0.0, 0.3])
    th = jnp.linspace(-0.5, 0.5, n_rays)
    rd = jnp.stack([jnp.sin(th), 0.1 * jnp.cos(3 * th), -jnp.cos(th)], -1)
    gtd = jnp.full((n_rays,), 1.5)
    pts = jax.random.uniform(
        kp, (n_rays * s, 3),
        minval=jnp.asarray([b[0] for b in bound]),
        maxval=jnp.asarray([b[1] for b in bound]))

    dev_time(lambda i: sum(
        v.e.sum() for v in prepare_grids(
            jax.tree.map(lambda g: g + i, grids), shapes_t).values()),
        'expand all grids fwd')

    eg0 = jax.tree.map(
        lambda g: g, prepare_grids(grids, shapes_t))
    cots = jax.tree.map(jnp.ones_like, eg0)

    def expand_loss(g):
        out = prepare_grids(g, shapes_t)
        return sum(jnp.vdot(v.e, cots[k2].e) for k2, v in out.items())
    grad_expand = jax.grad(expand_loss)
    dev_time(lambda i: sum(
        v.sum() for v in grad_expand(
            jax.tree.map(lambda g: g + i, grids)).values()),
        'expansion fwd + transpose fold (grad)')

    dev_time(lambda i: _z_values(
        jax.random.fold_in(key, i), rcfg, ro, rd, gtd, model.bound,
        'color').sum(), 'z sampling + 48-lane sort')

    egc = prepare_grids(grids, shapes_t)
    dev_time(lambda i: nice_eval(
        params, egc, pts + 0.0001 * i, 'color', dcfg, model.bound,
        model.coarse_bound, shapes_t).sum(),
        'nice_eval color fwd 48k pts (pre-exp)')

    def render_loss(g, cam_dummy, dec_color, pr, k):
        pr2 = {**pr, 'color': dec_color}
        g2 = prepare_grids(g, shapes_t)
        d, v, c, _ = render_rays(pr2, g2, ro + cam_dummy, rd, stage='color',
                                 model=model, rcfg=rcfg, gt_depth=gtd, key=k)
        return jnp.abs(gtd - d).sum() + 0.2 * jnp.abs(c - 0.5).sum()

    z3 = jnp.zeros(3)
    dev_time(lambda i: render_loss(
        grids, z3, params['color'], params, jax.random.fold_in(key, i)),
        'render loss fwd (expand inside)')

    grad_fn = jax.grad(render_loss, argnums=(0, 1, 2))
    def g_body(i):
        gg, gc, gd = grad_fn(grids, z3, params['color'], params,
                             jax.random.fold_in(key, i))
        return (sum(v.sum() for v in gg.values()) + gc.sum()
                + sum(jnp.asarray(l['w']).sum()
                      for l in gd['layers']) if isinstance(gd, dict)
                else gc.sum())
    def g_body2(i):
        gg, gc, gd = grad_fn(grids, z3, params['color'], params,
                             jax.random.fold_in(key, i))
        leaves = jax.tree.leaves((gg, gc, gd))
        return sum(l.sum() for l in leaves)
    dev_time(g_body2, 'full loss grad (grids+cam+dec)')

    # grad wrt pre-expanded buffers only (isolates the fold + canonical path)
    def render_loss_pre(eg, dec_color, pr, k):
        pr2 = {**pr, 'color': dec_color}
        d, v, c, _ = render_rays(pr2, eg, ro, rd, stage='color',
                                 model=model, rcfg=rcfg, gt_depth=gtd, key=k)
        return jnp.abs(gtd - d).sum() + 0.2 * jnp.abs(c - 0.5).sum()
    grad_pre = jax.grad(render_loss_pre)
    dev_time(lambda i: sum(
        v.e.sum() for v in grad_pre(
            egc, params['color'], params,
            jax.random.fold_in(key, i)).values()),
        'loss grad wrt EXPANDED bufs (no fold)')

    from nice_slam_tpu.utils.optim import adam_init, adam_update
    opt_params = {'cams': jnp.zeros((5, 7)), 'grids': grids,
                  'dec': {'color': params['color']}}
    st = adam_init(opt_params)
    fake_g = jax.tree.map(jnp.ones_like, opt_params)

    def adam_body(i):
        p2, st2 = adam_update(opt_params, fake_g, st,
                              0.01 * (1.0 + i))
        return sum(l.sum() for l in jax.tree.leaves(p2))
    dev_time(adam_body, 'adam update (full opt pytree)')


if __name__ == '__main__':
    main()
