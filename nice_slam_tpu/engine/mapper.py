"""Mapping engine (L3): joint grid/decoder/pose optimization.

Functional parity target: /root/reference/src/Mapper.py `optimize_map`
(:295-669) and its stage schedule:
  * a window of keyframes + the current frame supplies rays each iteration
    (pixels split evenly across frames, :362, :543-572);
  * the stage walks coarse|middle|fine|color by iteration fraction
    (:502-509) and each stage sets per-group learning rates from the config
    table (:510-518), scaled by lr_factor;
  * frustum feature selection freezes grid cells outside the current
    camera's view (:371-414, :633-642);
  * local BA optimizes all window poses except the oldest (:430-455), with
    camera lr active only in the color stage (:516-518);
  * iMAP*: single param group with StepLR(200, 0.8) decay (:483-485, 519-523)
    plus the free-space regulation loss (:616-621).

TPU design: the whole `num_joint_iters` loop is ONE `lax.scan` inside one
jit.  The stage schedule becomes data: a per-iteration learning-rate table
[iters, 6] indexed inside the scan, and `lax.switch` picks the stage's
render branch, so a single compiled program covers the middle/fine/color
phases.  Gradient masks reproduce frustum selection and pose freezing
exactly (see utils/optim.py).  A fresh Adam state per call matches the
reference's fresh optimizer per mapping invocation.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from nice_slam_tpu.core.cameras import Intrinsics, c2w_from_tensor, rays_from_uv
from nice_slam_tpu.core.sampling import (
    gather_pixels, ray_bound_exit, sample_pixels)
from nice_slam_tpu.render.renderer import (
    RenderConfig, SceneModel, regulation_sigma_batched, render_rays)
from nice_slam_tpu.utils.optim import adam_init, adam_update

# learning-rate table columns
(LR_DECODERS, LR_COARSE, LR_MIDDLE, LR_FINE, LR_COLOR, LR_CAM,
 LR_DEC_MIDDLE) = range(7)
STAGE_ORDER = ('coarse', 'middle', 'fine', 'color')


class MapperConfig(NamedTuple):
    """Static mapping hyperparameters (config `mapping.*`,
    configs/nice_slam.yaml:53-107)."""

    pixels: int = 1000
    iters: int = 60
    iters_first: int = 1500
    lr_factor: float = 1.0
    lr_first_factor: float = 5.0
    middle_iter_ratio: float = 0.4
    fine_iter_ratio: float = 0.6
    every_frame: int = 5
    ba: bool = True
    ba_cam_lr: float = 0.001
    fix_fine: bool = True
    fix_color: bool = False
    train_middle: bool = False   # from-scratch extension (no pretrain blobs)
    # Upper bound on rays rendered per pass inside one mapping iteration
    # (0 = render the whole window batch at once).  When the window's ray
    # count exceeds it, the render+loss runs as a lax.map over frame
    # groups with the gradient accumulating across groups — identical
    # math (draws, the global far-clamp max and the loss sum are all
    # computed outside the chunking) up to f32 summation order.  Used to
    # (a) bound live memory and (b) work around a current-stack XLA/TPU
    # codegen fault: iMAP-budget programs with >=5000 rays/pass fault
    # with UNAVAILABLE on v5e (2026-08-21; <=4000-ray programs and the
    # identical un-scanned body run fine — see BASELINE.md).
    max_rays_per_pass: int = 0
    frustum_selection: bool = True
    keyframe_every: int = 50
    window_size: int = 5
    w_color_loss: float = 0.2
    keyframe_selection: str = 'overlap'  # 'overlap' | 'global'
    color_refine: bool = True
    stage_lr: tuple = ()       # ((stage, (dec, coarse, mid, fine, color)),..)
    imap_decoders_lr: float = 0.0002
    # from-scratch extension: lr for the middle decoder, active ONLY during
    # the middle stage (training it in later stages shifts the geometry the
    # fine residual and grids were fit against and collapses the map)
    middle_decoder_lr: float = 0.005
    coarse_mapper: bool = False


def stage_schedule(mcfg: MapperConfig, n_iters: int, nice: bool
                   ) -> np.ndarray:
    """Per-iteration stage indices into STAGE_ORDER (Mapper.py:502-509)."""
    idx = np.zeros((n_iters,), dtype=np.int32)
    if not nice:
        idx[:] = 3  # imap always renders/losses like 'color'
        return idx
    if mcfg.coarse_mapper:
        idx[:] = 0
        return idx
    for it in range(n_iters):
        if it <= int(n_iters * mcfg.middle_iter_ratio):
            idx[it] = 1
        elif it <= int(n_iters * mcfg.fine_iter_ratio):
            idx[it] = 2
        else:
            idx[it] = 3
    return idx


def lr_table(mcfg: MapperConfig, n_iters: int, lr_factor: float, nice: bool,
             ba_active: bool) -> np.ndarray:
    """[n_iters, 6] learning rates (Mapper.py:510-523).

    NICE: per-stage rates from the config table scaled by lr_factor; camera
    lr = BA_cam_lr only in the color stage when BA is active.
    iMAP: decoders lr with StepLR(200, 0.8) decay; camera lr = BA_cam_lr.
    """
    table = np.zeros((n_iters, 7), dtype=np.float32)
    if nice:
        stages = dict(mcfg.stage_lr)
        sched = stage_schedule(mcfg, n_iters, nice=True)
        for it in range(n_iters):
            s = STAGE_ORDER[sched[it]]
            dec, c, m, f, col = stages[s]
            table[it, :5] = (dec * lr_factor, c * lr_factor, m * lr_factor,
                             f * lr_factor, col * lr_factor)
            if ba_active and s == 'color':
                table[it, LR_CAM] = mcfg.ba_cam_lr
            if s == 'middle':
                table[it, LR_DEC_MIDDLE] = mcfg.middle_decoder_lr * lr_factor
    else:
        steps = np.arange(n_iters) // 200
        table[:, LR_DECODERS] = mcfg.imap_decoders_lr * (0.8 ** steps)
        if ba_active:
            table[:, LR_CAM] = mcfg.ba_cam_lr
    return table


def _window_rays(cam7s, colors, depths, frame_keys, n_frames, pix_per_frame,
                 intr: Intrinsics):
    """Sample pixels from every window frame and build rays.

    The mapper samples the full image (no edge crop, Mapper.py:567-568).
    `frame_keys` is a [n_frames] key array — one independent stream per
    frame, so a keyframe-sharded step drawing frames f0..f0+k reproduces
    the replicated step's draws for those frames exactly.
    Returns flattened [F*P] rays and ground truth.
    """
    def per_frame(cam7, color, depth, k):
        i, j = sample_pixels(k, pix_per_frame, 0, intr.H, 0, intr.W)
        c2w = c2w_from_tensor(cam7)
        o, d = rays_from_uv(i, j, c2w, intr)
        return o, d, gather_pixels(depth, i, j), gather_pixels(color, i, j)

    o, d, dgt, cgt = jax.vmap(per_frame)(cam7s, colors, depths, frame_keys)
    flat = lambda x: x.reshape((-1,) + x.shape[2:])
    return flat(o), flat(d), flat(dgt), flat(cgt)



def build_stage_losses(*, model: SceneModel, rcfg: RenderConfig,
                       mcfg: MapperConfig, intr: Intrinsics, n_frames: int,
                       pix_per_frame: int, kf_axis: str | None = None,
                       n_frames_global: int | None = None):
    """Per-stage mapping loss functions (shared by the single-chip,
    ray-sharded and keyframe-sharded step builders).

    Returns (branch_stages, [loss_fn...]) where each loss_fn has signature
    (opt_params, frozen_dec, colors, depths, key) -> scalar loss and is the
    stage loss of Mapper.py:598-621 over `n_frames * pix_per_frame` rays.

    kf_axis: when set, the loss runs INSIDE a shard_map over that mesh axis
    with the window's frames split across devices (the multi-host keyframe
    sharding of SURVEY §2.3/§5.8): colors/depths arrive with the local
    [n_frames, ...] frame slice, `opt_params['cams']` stays replicated
    [n_frames_global, 7], and this device's slice plus its per-frame PRNG
    streams are selected by `axis_index`.  The local loss is this device's
    frames' term of the global sum — callers psum loss and grads.
    """
    nice = model.kind == 'nice'
    if kf_axis is not None:
        assert n_frames_global is not None, 'kf_axis needs n_frames_global'

    def full_params(opt_dec, frozen_dec):
        if not nice:
            return opt_dec['imap']
        return {**frozen_dec, **opt_dec}

    def loss_for_stage(stage: str):
        use_depth = not (mcfg.coarse_mapper or stage == 'coarse')

        def loss_fn(opt_params, frozen_dec, colors, depths, key):
            if not mcfg.ba:
                # BA off: poses are constants, not leaves (the reference
                # never builds camera tensors then, Mapper.py:430-455);
                # pruning their grads saves ~1 ms/iter in situ.
                opt_params = {**opt_params,
                              'cams': jax.lax.stop_gradient(
                                  opt_params['cams'])}
            params = full_params(opt_params['dec'], frozen_dec)
            grids = opt_params['grids'] if nice else None
            if nice and model.expanded:
                # rebuilt every iteration (the grids change under Adam) and
                # limited to the volumes THIS stage samples; autodiff
                # transposes the dense expansion into a shifted-add fold,
                # so the grid-grad scatter is one wide row per point
                from nice_slam_tpu.models.grids import prepare_grids
                grids = prepare_grids(grids, model.grid_shapes, stage=stage)
            cams = opt_params['cams']
            if kf_axis is None:
                frame_keys = jax.random.split(key, n_frames)
            else:
                # this device's frame slice of the replicated cams and of
                # the global per-frame key streams (bit-identical draws to
                # the replicated step); the dynamic_slice VJP scatters the
                # local cam grads back into the [F_global, 7] block
                f0 = jax.lax.axis_index(kf_axis) * n_frames
                cams = jax.lax.dynamic_slice_in_dim(cams, f0, n_frames)
                frame_keys = jax.lax.dynamic_slice_in_dim(
                    jax.random.split(key, n_frames_global), f0, n_frames)
            o, d, dgt, cgt = _window_rays(
                cams, colors, depths, frame_keys,
                n_frames, pix_per_frame, intr)
            if nice:
                # bbox prefilter as a weight mask (Mapper.py:580-596)
                t_exit = ray_bound_exit(jax.lax.stop_gradient(o),
                                        jax.lax.stop_gradient(d), model.bound)
                inside = t_exit >= dgt
            else:
                inside = jnp.ones_like(dgt, dtype=bool)
            d_render = jnp.where(inside, dgt, 0.0)
            # the reference's far clamp takes the max over the WHOLE
            # window ray batch (Renderer.py:137); under keyframe sharding
            # the global max needs a collective
            d_max = jnp.max(d_render)
            if kf_axis is not None:
                d_max = jax.lax.pmax(d_max, kf_axis)
            ray_keys = None
            if rcfg.perturb > 0.0:
                # per-ray draw streams derived from the globally indexed
                # per-frame streams, so the stratified jitter and the
                # importance u's are identical under keyframe sharding —
                # the same contract as the pixel and regulation draws
                ray_keys = jax.vmap(
                    lambda fk: jax.random.split(
                        jax.random.fold_in(fk, 11), pix_per_frame)
                )(frame_keys)
                # flatten [F, P] -> [F*P], keeping any raw-key trailing axis
                ray_keys = ray_keys.reshape((-1,) + ray_keys.shape[2:])

            def render_loss(o, d, dgt, cgt, inside, d_render, ray_keys,
                            frame_keys, n_f):
                """Render `n_f` frames' rays and sum their loss terms.
                Everything window-global (draws, d_max) is already fixed
                by the enclosing scope, so the window loss is the sum of
                these per-group losses regardless of grouping."""
                depth, var, color, _ = render_rays(
                    params, grids, o, d, stage=stage, model=model,
                    rcfg=rcfg,
                    gt_depth=(d_render if use_depth else None), key=key,
                    d_max=d_max, ray_keys=ray_keys)
                depth_mask = (dgt > 0) & inside
                loss = jnp.sum(jnp.where(depth_mask,
                                         jnp.abs(dgt - depth), 0.0))
                if (not nice) or stage == 'color':
                    col_l = jnp.sum(jnp.where(inside[:, None],
                                              jnp.abs(cgt - color), 0.0))
                    loss = loss + mcfg.w_color_loss * col_l
                if not rcfg.occupancy:  # iMAP free-space reg (:616-621)
                    # per-FRAME keys (derived from frame_keys), so the
                    # keyframe-sharded step's regulation draws are
                    # identical to the replicated step's — same contract
                    # as the pixel draws (parallel/distributed.py)
                    reg_keys = jax.vmap(
                        lambda kk: jax.random.fold_in(kk, 7))(frame_keys)
                    sigma = regulation_sigma_batched(
                        params, grids,
                        o.reshape(n_f, pix_per_frame, 3),
                        d.reshape(n_f, pix_per_frame, 3),
                        d_render.reshape(n_f, pix_per_frame),
                        model=model, rcfg=rcfg, keys=reg_keys, stage=stage)
                    loss = loss + 0.0005 * jnp.sum(jnp.abs(sigma))
                return loss

            groups = 1
            if mcfg.max_rays_per_pass:
                if pix_per_frame > mcfg.max_rays_per_pass:
                    # frame granularity is the finest split the grouping
                    # supports; anything finer needs intra-frame chunking
                    # which would change the per-frame draw/clamp semantics
                    raise ValueError(
                        f'mapping.max_rays_per_pass={mcfg.max_rays_per_pass} '
                        f'is below the per-frame ray count '
                        f'({pix_per_frame}); raise it to at least '
                        f'pixels/window or disable it (0)')
                groups = -(-n_frames * pix_per_frame
                           // mcfg.max_rays_per_pass)
                while n_frames % groups:   # groups must tile the window
                    groups += 1
            if groups == 1:
                return render_loss(o, d, dgt, cgt, inside, d_render,
                                   ray_keys, frame_keys, n_frames)

            # render in frame groups under lax.map: the backward pass then
            # also runs group-at-a-time (gradient accumulation), bounding
            # both live memory and the per-pass kernel sizes (see
            # max_rays_per_pass)
            n_f = n_frames // groups

            def regroup(x):
                return x.reshape((groups, -1) + x.shape[1:]) \
                    if x is not None else None

            mapped = dict(
                o=regroup(o), d=regroup(d), dgt=regroup(dgt),
                cgt=regroup(cgt), inside=regroup(inside),
                d_render=regroup(d_render),
                frame_keys=frame_keys.reshape(
                    (groups, n_f) + frame_keys.shape[1:]))
            if ray_keys is not None:
                mapped['ray_keys'] = regroup(ray_keys)

            def group_loss(a):
                return render_loss(a['o'], a['d'], a['dgt'], a['cgt'],
                                   a['inside'], a['d_render'],
                                   a.get('ray_keys'), a['frame_keys'], n_f)

            return jnp.sum(jax.lax.map(group_loss, mapped))

        return loss_fn

    if mcfg.coarse_mapper:
        branch_stages = ('coarse',)
    elif nice:
        branch_stages = ('middle', 'fine', 'color')
    else:
        branch_stages = ('color',)
    return branch_stages, [loss_for_stage(s) for s in branch_stages]


def scan_map_iters(grad_fns, nice, n_iters, opt_params, frozen_dec, masks,
                   lr_tab, stage_idx, cam_mask, colors, depths, key,
                   opt_state=None):
    """The shared per-call optimization scan: `n_iters` of (stage-dispatch
    gradient -> per-group lr lookup -> masked Adam), threading the Adam
    state.  Used by the single-chip (make_map_step), ray-sharded
    (parallel.sharded) and grid-blocked (parallel.blocks) step builders —
    they differ only in how `grad_fns` are built."""
    def body(carry, it):
        opt_p, state = carry
        k = jax.random.fold_in(key, it)
        lrs = lr_tab[it]
        if len(grad_fns) == 1:
            loss, grads = grad_fns[0](opt_p, frozen_dec, colors, depths, k)
        else:
            bidx = stage_idx[it] - 1  # middle=1 -> branch 0, etc.
            loss, grads = jax.lax.switch(
                bidx, grad_fns, opt_p, frozen_dec, colors, depths, k)

        if nice:
            lr_prefix = {
                'cams': lrs[LR_CAM],
                'grids': {name: lrs[1 + STAGE_ORDER.index(name)]
                          for name in opt_p['grids']},
                'dec': {kk: (lrs[LR_DEC_MIDDLE] if kk == 'middle'
                             else lrs[LR_DECODERS])
                        for kk in opt_p['dec']},
            }
        else:
            lr_prefix = {'cams': lrs[LR_CAM], 'grids': 0.0,
                         'dec': lrs[LR_DECODERS]}
        mask_prefix = {
            'cams': cam_mask[:, None],
            'grids': masks if masks is not None else 1.0,
            'dec': 1.0,
        }
        opt_p, state = adam_update(opt_p, grads, state, lr_prefix,
                                   mask=mask_prefix)
        return (opt_p, state), loss

    init = (opt_params,
            adam_init(opt_params) if opt_state is None else opt_state)
    (out, state), losses = jax.lax.scan(body, init, jnp.arange(n_iters))
    return out, state, losses


def make_map_step(*, model: SceneModel, rcfg: RenderConfig,
                  mcfg: MapperConfig, intr: Intrinsics, n_frames: int,
                  n_iters: int, pix_per_frame: int, salt: int = 0):
    """Build the jitted mapping program for a given window size/iteration
    count.  Recompiled only when those static sizes change (window growth,
    first-frame iters, color-refine).

    The returned jitted function:
      (opt_params, frozen_dec, masks, lr_tab, stage_idx, cam_mask,
       colors, depths, key, opt_state=None)
      -> (opt_params', opt_state', losses[n_iters])
    `opt_state=None` starts a fresh Adam (the reference's fresh optimizer
    per mapping invocation); passing the returned state chains calls into
    one longer optimization — the orchestrator runs the 1500-iteration
    first-frame mapping as chunked calls of THIS program (XLA compile time
    grows superlinearly with scan length on this stack: a 400-iteration
    program compiles in ~246 s vs ~20 s for 10 iterations).
    with
      opt_params = {'cams': [F, 7], 'grids': {...}, 'dec': {...}}
      frozen_dec: non-trainable decoder params (merged at eval time)
      masks: {grid_name: [Nx, Ny, Nz, 1] 0/1} or None (frustum selection)
      lr_tab: [n_iters, 6]; stage_idx: [n_iters] ints into STAGE_ORDER
      cam_mask: [F] 0/1 trainable-pose mask (oldest frozen; zeros if no BA)
      colors: [F, H, W, 3]; depths: [F, H, W].
    """
    nice = model.kind == 'nice'
    branch_stages, loss_fns = build_stage_losses(
        model=model, rcfg=rcfg, mcfg=mcfg, intr=intr, n_frames=n_frames,
        pix_per_frame=pix_per_frame)
    grad_fns = [jax.value_and_grad(f) for f in loss_fns]

    def map_step(opt_params, frozen_dec, masks, lr_tab, stage_idx, cam_mask,
                 colors, depths, key, opt_state=None):
        # compile-quality re-roll hook: `lr_tab` is a traced argument, so
        # adding the salt constant is a real (XLA-folded) HLO op that
        # changes the program hash; the orchestrator re-rolls the compile
        # with salt+1 when XLA drew a slow binary (engine/slam.py —
        # same nondeterminism as the tracking program)
        lr_tab = lr_tab + jnp.float32(salt) * 0.0
        return scan_map_iters(grad_fns, nice, n_iters, opt_params,
                              frozen_dec, masks, lr_tab, stage_idx,
                              cam_mask, colors, depths, key, opt_state)

    return jax.jit(map_step)
