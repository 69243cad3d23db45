"""TUM tracking-decode anatomy with the CORRECT barriers, at the
reference's TRUE TUM grid resolution (middle 0.16 / fine+color 0.08,
fr1/desk bound — /root/reference/configs/TUM_RGBD/tum.yaml grid_len;
round-3 profiling used a half-resolution stand-in and block_until_ready).

Measures, each amortized over in-program reps with a value-fetch barrier:
  embed       fourier embedding of 240k pts (x3 decoders worth)
  gather_mid  middle expanded-row gather (256 f32 rows)
  gather_fc   fused fine+color expanded-row gather (512 f32 rows)
  interp      both gathers + trilinear weight combine
  mlps        the three hidden-32 MLPs on precomputed features
  decode      full nice_eval color-stage forward
  decode_vjp  value_and_grad of sum(decode) wrt points (tracking's path)

Usage: python scripts/studies/proto_tum_decode_profile.py [n_points]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def bench(step, n_rep=30, label=''):
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
    print(f'{label:12s} {t * 1e3:8.3f} ms')
    return t


def main():
    jax.config.update('jax_default_matmul_precision', 'float32')
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 240 * 1024

    from nice_slam_tpu.models.decoders import (
        DecoderConfig, init_nice_decoders, mlp_apply, mlp_no_xyz_apply,
        nice_eval)
    from nice_slam_tpu.models.grids import (
        GridConfig, init_grids, prepare_grids, round_bound,
        static_grid_shapes)
    from nice_slam_tpu.ops.trilinear import (
        normalize_coords, sample_grid_feature)
    from nice_slam_tpu.render.renderer import SceneModel

    # TRUE TUM fr1/desk scale (tum.yaml grid_len + freiburg1_desk bound)
    bound = round_bound([[-4.6, 2.6], [-3.3, 3.2], [-2.0, 4.9]], 0.32)
    gcfg = GridConfig(bound=bound, middle_grid_len=0.16,
                      fine_grid_len=0.08, color_grid_len=0.08)
    dcfg = DecoderConfig()
    shapes = dict(static_grid_shapes(gcfg))
    print('grid shapes:', shapes)

    key = jax.random.PRNGKey(0)
    kg, kd, key = jax.random.split(key, 3)
    grids = init_grids(kg, gcfg)
    params = init_nice_decoders(kd, dcfg)
    model = SceneModel(kind='nice', decoder=dcfg,
                       bound=jnp.asarray(gcfg.bound_np),
                       coarse_bound=jnp.asarray(gcfg.coarse_bound_np),
                       grid_shapes=static_grid_shapes(gcfg))

    eg = jax.jit(lambda g: prepare_grids(g, model.grid_shapes,
                                         stage='color'))(grids)
    for k, v in eg.items():
        try:
            print(f'  expanded {k}: {v.e.shape} '
                  f'({v.e.size * 4 / 1e6:.0f} MB)')
        except AttributeError:
            print(f'  {k}: {getattr(v, "shape", None)}')

    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-2.0, 2.0, size=(n, 3)), jnp.float32)
    bnd = model.bound

    def perturb(i):
        return pts + jnp.float32(i) * 1e-12

    mid = eg['middle']
    fc = eg['finecolor'] if 'finecolor' in eg else None
    print('rows: middle', mid.e.shape, 'finecolor',
          fc.e.shape if fc is not None else None)

    def row_index(egr, p):
        nx, ny, nz = egr.shape
        p_nor = normalize_coords(p, bnd)
        sizes = jnp.array([nx, ny, nz], p_nor.dtype)
        idx = jnp.clip((p_nor + 1.0) * 0.5 * (sizes - 1.0), 0.0,
                       sizes - 1.0)
        i0 = jnp.floor(idx).astype(jnp.int32)
        return (i0[:, 0] * ny + i0[:, 1]) * nz + i0[:, 2]

    bench(lambda i: mid.e[row_index(mid, perturb(i))].ravel()[0],
          label='gather_mid')
    if fc is not None:
        bench(lambda i: fc.e[row_index(fc, perturb(i))].ravel()[0],
              label='gather_fc')

    bench(lambda i: sample_grid_feature(
        mid, perturb(i), bnd).ravel()[0], label='interp_mid')
    if fc is not None:
        bench(lambda i: sample_grid_feature(
            fc, perturb(i), bnd).ravel()[0], label='interp_fc')

    # MLPs on fixed features
    feat = jnp.asarray(rng.standard_normal((n, 32)), jnp.float32)

    def mlps(i):
        p = perturb(i)
        a = mlp_apply(params['middle'], dcfg, p, feat, color=False)
        b = mlp_apply(params['fine'], dcfg, p,
                      jnp.concatenate([feat, feat], -1), color=False,
                      skips=())
        c = mlp_apply(params['color'], dcfg, p, feat, color=True)
        return a.ravel()[0] + b.ravel()[0] + c.ravel()[0]
    bench(mlps, label='mlps')

    def decode(i):
        return nice_eval(params, eg, perturb(i), 'color',
                         dcfg, bnd, model.coarse_bound,
                         model.grid_shapes).ravel()[0]
    try:
        bench(decode, label='decode')
    except TypeError:
        # signature drift guard: call through the model wrapper instead
        from nice_slam_tpu.render.renderer import eval_points
        def decode2(i):
            return eval_points(params, eg, perturb(i), model=model,
                               stage='color').ravel()[0]
        bench(decode2, label='decode')

    def decode_vjp(i):
        def f(p):
            return jnp.sum(nice_eval(
                params, eg, p, 'color', dcfg, bnd,
                model.coarse_bound, model.grid_shapes))
        return jax.grad(f)(perturb(i)).ravel()[0]
    try:
        bench(decode_vjp, label='decode_vjp')
    except Exception as e:
        print('decode_vjp failed:', type(e).__name__, str(e)[:200])


if __name__ == '__main__':
    main()
