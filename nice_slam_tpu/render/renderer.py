"""Volume renderer (L2).

Functional parity target: /root/reference/src/utils/Renderer.py.
  * eval_points   (:36-93):  out-of-bound points get occupancy logit 100
    (an opaque wall at the scene boundary in occupancy mode).
  * render_batch_ray (:95-262): near/far from sensor depth + bbox exit,
    N_samples stratified + N_surface near-surface samples, merge-sort along
    the ray, decode, composite; optional N_importance pdf resampling (iMAP).
  * render_img    (:264-340): whole-frame render in ray chunks.
  * regulation    (:343-409): iMAP free-space density loss samples.

TPU design notes:
  * One training call renders ALL rays of a batch in a single fused program —
    no Python chunk loop inside jit; the [N_rays*S, 4] decoder evaluation is
    the MXU hot path.
  * `render_image` uses `lax.map` over fixed-size ray chunks so a full
    680x1200 frame (39M point evals at 48 samples/ray) compiles once and
    stays on-device.
  * The sample-axis sort is a static-width `jnp.sort` (48 lanes/ray).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from nice_slam_tpu.core.cameras import Intrinsics, rays_full_image
from nice_slam_tpu.core.composite import composite_rays
from nice_slam_tpu.core.sampling import (
    near_far_from_depth, sample_pdf, stratified_z_vals, surface_z_vals)
from nice_slam_tpu.models.decoders import DecoderConfig, imap_eval, nice_eval


class RenderConfig(NamedTuple):
    """Static rendering hyperparameters (config `rendering.*`,
    configs/nice_slam.yaml:121-126)."""

    n_samples: int = 32
    n_surface: int = 16
    n_importance: int = 0
    lindisp: bool = False
    perturb: float = 0.0
    occupancy: bool = True
    ray_chunk: int = 100000   # render_image chunking (Renderer.py:6-10)
    # pose gradient through the z sampling locations (see
    # core.sampling.near_far_from_depth); False (default) = reference
    # semantics, True = opt-in extra exact gradient term
    grad_z: bool = False


class SceneModel(NamedTuple):
    """Bundles the static model description with the scene bounds.

    kind: 'nice' | 'imap'.  bound/coarse_bound are [3, 2] float arrays
    (coarse_bound is the enlarged bound fed to the coarse decoder,
    NICE_SLAM.py:208).  grid_shapes is the static ((name, (nx, ny, nz)),
    ...) tuple describing the flat [M, c_dim] grid buffers (see
    ops/trilinear.py for why grids are stored flat).
    """

    kind: str
    decoder: DecoderConfig
    bound: jnp.ndarray
    coarse_bound: jnp.ndarray | None = None
    grid_shapes: tuple = ()
    # Use the corner-expanded gather layout (ops/trilinear.ExpandedGrid) in
    # the engines/renderer: ~8x fewer gathered rows per query point on TPU.
    # Same math as the baseline path up to f32 summation order.
    expanded: bool = True
    # Use the fused Pallas decoder kernel (ops/pallas/fused_mlp.py) for MLP
    # forwards.  Eval-only paths (mesher lattice query, full-frame renders)
    # set this via model._replace(fused_eval=True); training keeps the XLA
    # path (the kernel's VJP falls back to XLA autodiff anyway).
    fused_eval: bool = False


@jax.custom_vjp
def _permute_rows(x: jnp.ndarray, order: jnp.ndarray) -> jnp.ndarray:
    """take_along_axis along axis 1 where `order` is a PERMUTATION.

    The generic gather VJP is a scatter-add; for a permutation the
    transpose is itself a gather by the inverse permutation, which is far
    cheaper on TPU (the importance-merge path spends its time here
    otherwise)."""
    return jnp.take_along_axis(x, order[..., None], axis=1)


def _permute_rows_fwd(x, order):
    return _permute_rows(x, order), jnp.argsort(order, axis=-1)


def _permute_rows_bwd(inv_order, g):
    return jnp.take_along_axis(g, inv_order[..., None], axis=1), None


_permute_rows.defvjp(_permute_rows_fwd, _permute_rows_bwd)


def eval_raw(params: Any, grids: dict[str, jnp.ndarray] | None,
             p: jnp.ndarray, stage: str, model: SceneModel) -> jnp.ndarray:
    """Decode points to raw [r, g, b, occ/sigma]; out-of-bound -> occ 100.

    (Renderer.py:59-93.)
    """
    if model.kind == 'nice':
        raw = nice_eval(params, grids, p, stage, model.decoder, model.bound,
                        model.coarse_bound, model.grid_shapes,
                        fused=model.fused_eval)
    else:
        raw = imap_eval(params, p, model.decoder)
    inside = jnp.all((p > model.bound[:, 0]) & (p < model.bound[:, 1]),
                     axis=-1)
    occ = jnp.where(inside, raw[..., 3], 100.0)
    return jnp.concatenate([raw[..., :3], occ[..., None]], axis=-1)


def _z_values(key: jax.Array | None, rcfg: RenderConfig,
              rays_o: jnp.ndarray, rays_d: jnp.ndarray,
              gt_depth: jnp.ndarray | None, bound: jnp.ndarray,
              stage: str, d_max: jnp.ndarray | None = None,
              ray_keys: jax.Array | None = None) -> jnp.ndarray:
    """Sample depths along rays (Renderer.py:125-224).

    The coarse stage ignores sensor depth entirely (:125-126).
    `d_max` overrides the batch depth maximum (sharded callers pass the
    global value; see core.sampling.near_far_from_depth).
    Returns [N_rays, S] sorted, S = n_samples (+ n_surface with depth).
    """
    use_depth = gt_depth is not None and stage != 'coarse'
    near, far = near_far_from_depth(rays_o, rays_d, bound,
                                    gt_depth if use_depth else None,
                                    grad_z=rcfg.grad_z, d_max=d_max)
    z_vals = stratified_z_vals(
        rcfg.n_samples, near, far, lindisp=rcfg.lindisp,
        perturb=rcfg.perturb, key=key, ray_keys=ray_keys)
    if use_depth and rcfg.n_surface > 0:
        z_surf = surface_z_vals(rcfg.n_surface, gt_depth, d_max=d_max)
        # NOTE: a two-way rank merge (the inputs are each sorted) was
        # benchmarked at this shape and does NOT beat the lane sort on TPU
        # (scripts/studies/proto_merge.py: sort 0.55 ms vs merge 0.61 ms) —
        # both are dominated by fixed per-op overhead at <=48 lanes.
        z_vals = jnp.sort(jnp.concatenate([z_vals, z_surf], axis=-1), axis=-1)
    return z_vals


def render_rays(params: Any, grids: dict[str, jnp.ndarray] | None,
                rays_o: jnp.ndarray, rays_d: jnp.ndarray, *, stage: str,
                model: SceneModel, rcfg: RenderConfig,
                gt_depth: jnp.ndarray | None = None,
                key: jax.Array | None = None,
                d_max: jnp.ndarray | None = None,
                ray_keys: jax.Array | None = None):
    """Render a batch of rays (Renderer.py:95-262).

    Args:
      rays_o, rays_d: [N, 3].
      gt_depth: [N] sensor depth or None (the coarse mapper passes None,
        Mapper.py:598-600).
      key: PRNG key, required when perturb>0 or stochastic n_importance.
      d_max: batch depth-maximum override for sharded callers.
      ray_keys: optional [N] key array — per-ray stochastic-draw streams
        (stratified jitter + importance u's), making the draws invariant
        to how the batch is sharded; takes precedence over `key` for
        those draws.
    Returns:
      (depth [N], depth_var [N], color [N, 3], weights [N, S]).
    """
    k_strat = k_imp = None
    if key is not None:
        k_strat, k_imp = jax.random.split(key)
    strat_ray_keys = imp_ray_keys = None
    if ray_keys is not None:
        strat_ray_keys = jax.vmap(
            lambda k: jax.random.fold_in(k, 0))(ray_keys)
        imp_ray_keys = jax.vmap(
            lambda k: jax.random.fold_in(k, 1))(ray_keys)
    z_vals = _z_values(k_strat, rcfg, rays_o, rays_d, gt_depth,
                       model.bound, stage, d_max=d_max,
                       ray_keys=strat_ray_keys)
    pts = rays_o[..., None, :] + rays_d[..., None, :] * z_vals[..., :, None]
    n_rays, s = z_vals.shape
    raw = eval_raw(params, grids, pts.reshape(-1, 3), stage, model)
    raw = raw.reshape(n_rays, s, 4)
    depth, var, color, weights = composite_rays(
        raw, z_vals, rays_d, occupancy=rcfg.occupancy)

    if rcfg.n_importance > 0:
        z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        z_samples = sample_pdf(
            k_imp if k_imp is not None else jax.random.PRNGKey(0),
            z_mid, weights[..., 1:-1], rcfg.n_importance,
            det=(rcfg.perturb == 0.0), ray_keys=imp_ray_keys)
        z_samples = jax.lax.stop_gradient(z_samples)
        # The reference re-decodes ALL s + n_importance points here
        # (Renderer.py:244-259).  The decoder is a pure function, so the
        # first s values are identical to `raw` above — decode only the
        # new importance points and merge along the sorted z order.  This
        # cuts the iMAP hot path from 2s+n_imp to s+n_imp point evals per
        # ray per iteration (48+12: 108 -> 60).
        pts_new = rays_o[..., None, :] \
            + rays_d[..., None, :] * z_samples[..., :, None]
        raw_new = eval_raw(params, grids, pts_new.reshape(-1, 3), stage,
                           model)
        raw_new = raw_new.reshape(n_rays, rcfg.n_importance, 4)
        z_all = jnp.concatenate([z_vals, z_samples], axis=-1)
        order = jnp.argsort(z_all, axis=-1)
        z_vals = _permute_rows(z_all[..., None], order)[..., 0]
        raw = _permute_rows(jnp.concatenate([raw, raw_new], axis=1), order)
        depth, var, color, weights = composite_rays(
            raw, z_vals, rays_d, occupancy=rcfg.occupancy)

    return depth, var, color, weights


def render_image(params: Any, grids: dict[str, jnp.ndarray] | None,
                 c2w: jnp.ndarray, intr: Intrinsics, *, stage: str,
                 model: SceneModel, rcfg: RenderConfig,
                 gt_depth: jnp.ndarray | None = None):
    """Render a full frame in fixed-size ray chunks (Renderer.py:264-340).

    Returns (depth [H, W], depth_var [H, W], color [H, W, 3]).
    """
    if model.kind == 'nice' and model.expanded and grids:
        from nice_slam_tpu.models.grids import prepare_grids
        grids = prepare_grids(grids, model.grid_shapes, stage=stage)
    rays_o, rays_d = rays_full_image(c2w, intr)
    n = intr.H * intr.W
    chunk = min(rcfg.ray_chunk, n)
    pad = (-n) % chunk
    rays_o = jnp.pad(rays_o, ((0, pad), (0, 0)))
    rays_d = jnp.pad(rays_d, ((0, pad), (0, 0)), constant_values=1.0)
    d_flat = None
    if gt_depth is not None:
        d_flat = jnp.pad(gt_depth.reshape(-1), (0, pad))

    n_chunks = (n + pad) // chunk
    o_c = rays_o.reshape(n_chunks, chunk, 3)
    d_c = rays_d.reshape(n_chunks, chunk, 3)

    if d_flat is None:
        def chunk_fn(args):
            o, d = args
            depth, var, color, _ = render_rays(
                params, grids, o, d, stage=stage, model=model, rcfg=rcfg,
                gt_depth=None)
            return depth, var, color
        depth, var, color = jax.lax.map(chunk_fn, (o_c, d_c))
    else:
        def chunk_fn(args):
            o, d, dep = args
            depth, var, color, _ = render_rays(
                params, grids, o, d, stage=stage, model=model, rcfg=rcfg,
                gt_depth=dep)
            return depth, var, color
        dep_c = d_flat.reshape(n_chunks, chunk)
        depth, var, color = jax.lax.map(chunk_fn, (o_c, d_c, dep_c))
    depth = depth.reshape(-1)[:n].reshape(intr.H, intr.W)
    var = var.reshape(-1)[:n].reshape(intr.H, intr.W)
    color = color.reshape(-1, 3)[:n].reshape(intr.H, intr.W, 3)
    return depth, var, color


def regulation_sigma(params: Any, grids: dict[str, jnp.ndarray] | None,
                     rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                     gt_depth: jnp.ndarray, *, model: SceneModel,
                     rcfg: RenderConfig, key: jax.Array,
                     stage: str = 'color') -> jnp.ndarray:
    """iMAP free-space regulation: densities sampled in [0, 0.85 d]
    with stratified jitter (Renderer.py:343-409).

    Returns sigma [N_rays * n_samples].
    """
    d = gt_depth.reshape(-1, 1)
    z_vals = stratified_z_vals(rcfg.n_samples, jnp.zeros_like(d), d * 0.85,
                               perturb=1.0, key=key)
    pts = rays_o[..., None, :] + rays_d[..., None, :] * z_vals[..., :, None]
    raw = eval_raw(params, grids, pts.reshape(-1, 3), stage, model)
    return raw[:, 3]


def regulation_sigma_batched(params: Any,
                             grids: dict[str, jnp.ndarray] | None,
                             rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                             gt_depth: jnp.ndarray, *, model: SceneModel,
                             rcfg: RenderConfig, keys: jax.Array,
                             stage: str = 'color') -> jnp.ndarray:
    """Per-frame regulation with one FLAT decoder call.

    Args have a leading frame axis: rays_o/rays_d [F, P, 3], gt_depth
    [F, P], keys [F] (one PRNG stream per frame — the contract the
    keyframe-sharded mapper relies on for draw parity).  Only the cheap
    stratified draw is vmapped; the hidden-256 decode runs as a single
    [F*P*S, 3] batch, which keeps the MXU on one large matmul instead of
    F smaller ones.  Returns sigma [F * P * n_samples].
    """
    f, p = gt_depth.shape

    def draw(dd, kk):
        d = dd.reshape(-1, 1)
        return stratified_z_vals(rcfg.n_samples, jnp.zeros_like(d),
                                 d * 0.85, perturb=1.0, key=kk)

    z_vals = jax.vmap(draw)(gt_depth, keys)              # [F, P, S]
    pts = rays_o[..., None, :] + rays_d[..., None, :] * z_vals[..., :, None]
    raw = eval_raw(params, grids, pts.reshape(-1, 3), stage, model)
    return raw[:, 3]
