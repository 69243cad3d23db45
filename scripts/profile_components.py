"""Microbenchmark of the hot-path components on the current device.

Times (post-compile, median of 20):
  * trilinear gather per grid at mapping scale
  * full nice_eval forward (color stage)
  * render_rays forward
  * one mapping grad iteration (value_and_grad of render loss)
  * one tracking grad iteration
Usage: python scripts/profile_components.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, n=20):
    """Per-call latency (block every call) and pipelined throughput
    (dispatch n, block once) in ms."""
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    lat = float(np.median(ts) * 1e3)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    thr = (time.perf_counter() - t0) / n * 1e3
    return f'{lat:8.3f} ms/call  {thr:8.3f} ms pipelined'


def main():
    import jax
    import jax.numpy as jnp

    from nice_slam_tpu.utils.compilation_cache import enable
    enable()
    jax.config.update('jax_default_matmul_precision', 'float32')

    from nice_slam_tpu.models.decoders import DecoderConfig, init_nice_decoders
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
    for name, g in grids.items():
        print(name, shapes[name], g.shape, f'{g.nbytes/1e6:.2f} MB')

    n_pts = 48000  # 1000 rays x 48 samples
    pts = jax.random.uniform(
        kp, (n_pts, 3),
        minval=jnp.asarray([b[0] for b in bound]),
        maxval=jnp.asarray([b[1] for b in bound]))

    # 1. trilinear alone per grid
    for name in ('middle', 'fine', 'color'):
        f = jax.jit(lambda g, p, name=name: sample_grid_feature(
            g, p, jnp.asarray(gcfg.bound_np), shapes[name]))
        ms = timeit(f, grids[name], pts)
        print(f"trilinear {name:7s} {n_pts} pts: {ms}")

    # 2. full decode fwd (color stage: 4 grids + 3 MLPs)
    from nice_slam_tpu.models.decoders import nice_eval
    f = jax.jit(lambda pr, g, p: nice_eval(
        pr, g, p, 'color', dcfg, model.bound, model.coarse_bound,
        model.grid_shapes))
    print(f'nice_eval color fwd {n_pts}: {timeit(f, params, grids, pts)}')

    # 3. render_rays fwd, 1000 rays
    n_rays = 1000
    ro = jnp.zeros((n_rays, 3)) + jnp.asarray([2.0, 0.0, 0.3])
    th = jnp.linspace(-0.5, 0.5, n_rays)
    rd = jnp.stack([jnp.sin(th), 0.1 * jnp.cos(3 * th), -jnp.cos(th)], -1)
    gtd = jnp.full((n_rays,), 1.5)
    f = jax.jit(lambda pr, g: render_rays(
        pr, g, ro, rd, stage='color', model=model, rcfg=rcfg, gt_depth=gtd))
    print(f'render_rays color fwd {n_rays}: {timeit(f, params, grids)}')

    # 4. one mapping-style grad iter (loss -> grids + color decoder grads)
    def loss_fn(g, dec_color, pr):
        pr2 = {**pr, 'color': dec_color}
        d, v, c, _ = render_rays(pr2, g, ro, rd, stage='color', model=model,
                                 rcfg=rcfg, gt_depth=gtd)
        return jnp.abs(gtd - d).sum() + jnp.abs(c - 0.5).sum()
    f = jax.jit(jax.grad(loss_fn, argnums=(0, 1)))
    print(f'map grad iter (1000 rays): '
          f'{timeit(f, grids, params["color"], params)}')

    # 5. per-stage grad iter
    for stage in ('coarse', 'middle', 'fine'):
        def loss_s(g, pr, stage=stage):
            d, v, c, _ = render_rays(pr, g, ro, rd, stage=stage, model=model,
                                     rcfg=rcfg, gt_depth=gtd)
            return jnp.abs(gtd - d).sum()
        f = jax.jit(jax.grad(loss_s))
        print(f'map grad iter stage={stage:7s}: '
              f'{timeit(f, grids, params)}')

    # 6. tracking grad iter: 200 rays, grad wrt cam7 through render
    from nice_slam_tpu.core.cameras import c2w_from_tensor
    n_tr = 200
    cam7 = jnp.asarray([1.0, 0, 0, 0, 2.0, 0.0, 0.3])
    uv_dir = rd[:n_tr]
    def tloss(c7, pr, g):
        c2w = c2w_from_tensor(c7)
        o = jnp.broadcast_to(c2w[:3, 3], (n_tr, 3))
        d = (uv_dir @ c2w[:3, :3].T)
        dep, var, col, _ = render_rays(pr, g, o, d, stage='color',
                                       model=model, rcfg=rcfg,
                                       gt_depth=gtd[:n_tr])
        return (jnp.abs(gtd[:n_tr] - dep) / jnp.sqrt(var + 1e-10)).sum()
    f = jax.jit(jax.grad(tloss))
    print(f'track grad iter (200 rays): '
          f'{timeit(f, cam7, params, grids)}')


if __name__ == '__main__':
    main()
