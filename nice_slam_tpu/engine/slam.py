"""Single-controller SLAM orchestrator (L4).

Functional parity target: /root/reference/src/NICE_SLAM.py + the run loops
of Tracker.py:151-299 and Mapper.py:671-806.

The reference runs 3 OS processes (tracker / mapper / coarse mapper) that
poll shared-memory tensors with sleep(0.1) busy-waits (sync gates
Tracker.py:173-192, Mapper.py:683-695).  Under `sync_method='strict'` (the
default everywhere) that machinery serializes to a fixed interleaving:

    map(0, iters_first) ; then per frame idx>=1:
        track(idx) ; if idx % every_frame == 0 or idx == n-1: map(idx)

This orchestrator executes exactly that interleaving from ONE Python
controller: tracking and mapping are jitted programs exchanging pytrees of
device arrays — no processes, no shared memory, no polling.

'loose'/'free' are the overlapped modes: mapping is dispatched
asynchronously (JAX dispatch already is) and the tracker keeps rendering
against its current grid snapshot until the mapping outputs are actually
ready (`jax.Array.is_ready`, no polling sleeps) — the exact analog of the
reference tracker cloning the shared grids whenever it passes its gate
(Tracker.py:137-149).  'loose' additionally forces a refresh once the
tracker gets more than every_frame + every_frame//2 frames ahead of the
last consumed mapping (the reference's loose window, Tracker.py:183-187);
'free' never forces.  When the host exposes more than one device (the
reference runs tracking/mapping on separate CUDA devices via
tracking.device/mapping.device, nice_slam.yaml:38,54), mapping executes on
device 1 and tracking on device 0, so the two phases genuinely overlap;
grid snapshots move device-to-device, exactly the §5.8 design.  BA-active
mapping calls commit synchronously in every mode (their pose writes feed
the motion model).

State ownership (single-writer, like the reference):
  * tracker writes estimate_c2w_list[idx]
  * mapper writes grids/decoders/keyframe poses (BA)
  * the coarse mapper owns only the coarse grid and its own keyframe list
    (Mapper.__init__:82-87 — it is a second Mapper instance)
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from nice_slam_tpu.core.cameras import (
    Intrinsics, c2w_from_tensor_4x4, tensor_from_c2w)
from nice_slam_tpu.engine.frustum import frustum_mask
from nice_slam_tpu.engine.keyframes import Keyframe, KeyframeStore
from nice_slam_tpu.engine.mapper import (
    MapperConfig, lr_table, make_map_step, stage_schedule)
from nice_slam_tpu.engine.tracker import (
    TrackerConfig, const_speed_init, make_track_frame)
from nice_slam_tpu.models.decoders import (
    init_imap_decoder, init_nice_decoders)
from nice_slam_tpu.models.grids import (
    GridConfig, grid_shapes, grid_world_coords, init_grids,
    static_grid_shapes)
from nice_slam_tpu.render.renderer import RenderConfig, SceneModel
from nice_slam_tpu.utils import config as cfgutil
from nice_slam_tpu.utils.ckpt import save_checkpoint

# TPU v5e per-chip HBM bandwidth, used by the grid-expansion autotune
# threshold (bench.py carries the same constant)
HBM_PEAK_GBPS = 819.0


def tracker_config_from_cfg(cfg: dict) -> TrackerConfig:
    t = cfg['tracking']
    return TrackerConfig(
        pixels=int(t['pixels']), iters=int(t['iters']),
        cam_lr=float(t['lr']), separate_lr=bool(t['seperate_LR']),
        w_color_loss=float(t['w_color_loss']),
        use_color=bool(t['use_color_in_tracking']),
        ignore_edge_w=int(t['ignore_edge_W']),
        ignore_edge_h=int(t['ignore_edge_H']),
        handle_dynamic=bool(t['handle_dynamic']),
        const_speed=bool(t['const_speed_assumption']),
        var_floor=float(t.get('var_floor', 1e-10)))


def mapper_config_from_cfg(cfg: dict, *, coarse_mapper: bool = False
                           ) -> MapperConfig:
    m = cfg['mapping']
    stage_lr = tuple(
        (s, (float(m['stage'][s]['decoders_lr']),
             float(m['stage'][s]['coarse_lr']),
             float(m['stage'][s]['middle_lr']),
             float(m['stage'][s]['fine_lr']),
             float(m['stage'][s]['color_lr'])))
        for s in ('coarse', 'middle', 'fine', 'color')) \
        if 'stage' in m else ()
    sel = m['keyframe_selection_method']
    if coarse_mapper:
        sel = 'global'  # forced for the coarse mapper (Mapper.py:82-84)
    return MapperConfig(
        pixels=int(m['pixels']), iters=int(m['iters']),
        iters_first=int(m['iters_first']),
        lr_factor=float(m['lr_factor']),
        lr_first_factor=float(m['lr_first_factor']),
        middle_iter_ratio=float(m['middle_iter_ratio']),
        fine_iter_ratio=float(m['fine_iter_ratio']),
        every_frame=int(m['every_frame']),
        ba=bool(m['BA']), ba_cam_lr=float(m['BA_cam_lr']),
        fix_fine=bool(m['fix_fine']), fix_color=bool(m['fix_color']),
        train_middle=bool(m.get('train_middle', False)),
        frustum_selection=bool(m['frustum_feature_selection']),
        keyframe_every=int(m['keyframe_every']),
        window_size=int(m['mapping_window_size']),
        w_color_loss=float(m['w_color_loss']),
        keyframe_selection=sel,
        color_refine=bool(m['color_refine']),
        stage_lr=stage_lr,
        imap_decoders_lr=float(m.get('imap_decoders_lr', 0.0002)),
        max_rays_per_pass=int(m.get('max_rays_per_pass', 0)),
        coarse_mapper=coarse_mapper)


@dataclass
class PhaseTimers:
    """Aux subsystem #1 (SURVEY.md §5): per-phase wall-clock accounting."""
    track_s: float = 0.0
    map_s: float = 0.0
    coarse_map_s: float = 0.0
    mesh_s: float = 0.0
    frames_tracked: int = 0
    frames_mapped: int = 0
    map_iters: int = 0

    def summary(self) -> dict:
        out = {
            'track_s': round(self.track_s, 3),
            'map_s': round(self.map_s, 3),
            'coarse_map_s': round(self.coarse_map_s, 3),
            'mesh_s': round(self.mesh_s, 3),
            'frames_tracked': self.frames_tracked,
            'frames_mapped': self.frames_mapped,
            'map_iters': self.map_iters,
        }
        if self.track_s > 0:
            out['tracked_fps'] = round(self.frames_tracked / self.track_s, 3)
        if self.map_s > 0:
            out['map_iters_per_s'] = round(self.map_iters / self.map_s, 2)
        return out


class SlamSystem:
    """Owns all SLAM state and drives the strict-sync schedule."""

    def __init__(self, cfg: dict, *, nice: bool = True,
                 input_folder: str | None = None,
                 output: str | None = None, seed: int = 0,
                 frame_reader=None, verbose: bool | None = None):
        from nice_slam_tpu.utils.compilation_cache import enable as _cc
        _cc()
        # Full-f32 matmuls: jax's default TPU precision is single-pass
        # bfloat16, which destabilizes the pose optimization over long
        # sequences (non-finite pose observed at frame ~37 of a 40-frame
        # run; clean under f32).  The workload is gather/bandwidth-bound,
        # not MXU-bound, so the 3-pass f32 emulation costs little.
        jax.config.update(
            'jax_default_matmul_precision',
            cfg.get('matmul_precision', 'float32'))
        self.cfg = cfg
        self.nice = nice
        self.verbose = cfg.get('verbose', False) if verbose is None \
            else verbose
        self.output = output or cfg['data'].get('output', 'output/run')
        os.makedirs(self.output, exist_ok=True)
        os.makedirs(os.path.join(self.output, 'ckpts'), exist_ok=True)
        os.makedirs(os.path.join(self.output, 'mesh'), exist_ok=True)

        self.intr: Intrinsics = cfgutil.intrinsics_from_cfg(cfg)
        self.rcfg: RenderConfig = cfgutil.render_config_from_cfg(cfg)
        self.dcfg = cfgutil.decoder_config_from_cfg(cfg)
        self.gcfg: GridConfig = cfgutil.grid_config_from_cfg(cfg)
        self.tcfg = tracker_config_from_cfg(cfg)
        self.mcfg = mapper_config_from_cfg(cfg)
        if (not nice and self.mcfg.max_rays_per_pass == 0
                and jax.default_backend() == 'tpu'
                and os.environ.get('NSTPU_IMAP_FAULT') != '0'):
            # current-stack workaround (see MapperConfig.max_rays_per_pass):
            # iMAP-budget mapping programs with >=5000 rays/pass fault on
            # v5e; chunk to <=4096 rays unless the config says otherwise.
            # `scripts/imap_fault_canary.py` probes whether the stack is
            # fixed; NSTPU_IMAP_FAULT=0 then restores the unchunked
            # program (~5% faster mapping).
            self.mcfg = self.mcfg._replace(max_rays_per_pass=4096)
        self.coarse_enabled = bool(cfg['coarse']) and nice
        if self.coarse_enabled:
            self.coarse_mcfg = mapper_config_from_cfg(cfg, coarse_mapper=True)

        bound = jnp.asarray(self.gcfg.bound_np)
        coarse_bound = jnp.asarray(self.gcfg.coarse_bound_np)
        self.model = SceneModel(
            kind='nice' if nice else 'imap', decoder=self.dcfg,
            bound=bound, coarse_bound=coarse_bound if nice else None,
            grid_shapes=static_grid_shapes(self.gcfg) if nice else ())

        key = jax.random.PRNGKey(seed)
        k_grid, k_dec, self.key = jax.random.split(key, 3)
        self.np_rng = np.random.default_rng(seed)

        if nice:
            self.grids = init_grids(k_grid, self.gcfg)
            params = init_nice_decoders(k_dec, self.dcfg)
            pre = cfg.get('pretrained_decoders') or {}
            params = self._maybe_load_pretrain(params, pre)
            trainable_keys = set()
            if not self.mcfg.fix_fine:
                trainable_keys.add('fine')
            if not self.mcfg.fix_color:
                trainable_keys.add('color')
            if self.mcfg.train_middle:
                # from-scratch extension; the reference NEVER optimizes the
                # middle decoder (Mapper.py:418-423).  Combined with loaded
                # pretrained decoders it degrades badly (measured: 100-frame
                # demo-budget drift 6 cm -> 36 cm, BASELINE.md round 4) —
                # the mapper perturbs the pretrained geometry MLP under the
                # tracker.
                if pre.get('middle_fine'):
                    import warnings
                    warnings.warn(
                        'mapping.train_middle=True with pretrained '
                        'decoders loaded: the pretrained middle MLP will '
                        'be perturbed during mapping (the reference never '
                        'trains it); expect tracking drift — set '
                        'train_middle: false', UserWarning, stacklevel=2)
                trainable_keys.add('middle')
            self.opt_dec = {k: params[k] for k in sorted(trainable_keys)}
            self.frozen_dec = {k: v for k, v in params.items()
                               if k not in trainable_keys}
        else:
            self.grids = {}
            self.opt_dec = {'imap': init_imap_decoder(k_dec, self.dcfg)}
            self.frozen_dec = {}

        self.frame_reader = frame_reader
        if frame_reader is None:
            from nice_slam_tpu.io.datasets import get_dataset
            self.frame_reader = get_dataset(cfg, input_folder)
        self.n_img = len(self.frame_reader)

        self.estimate_c2w = np.zeros((self.n_img, 4, 4), dtype=np.float32)
        self.gt_c2w = np.zeros((self.n_img, 4, 4), dtype=np.float32)
        self.keyframes = KeyframeStore()
        self.coarse_keyframes = KeyframeStore()
        self._kf_device: dict[int, tuple[jnp.ndarray, jnp.ndarray]] = {}

        # grid-node coordinates for the frustum masks, resident on device
        if nice:
            self._grid_points = {
                name: jnp.asarray(
                    grid_world_coords(self.gcfg, name).reshape(-1, 3))
                for name in self.grids}
            self._grid_shapes = grid_shapes(self.gcfg)

        self._track_fn = None
        self._map_fns: dict[tuple, Any] = {}
        self._dispatch_s = None
        self._fetch_base_s = None
        # tag -> (salt, agreed_time) of the accepted binary, for tests and
        # the rank-synchronized probe (see _agree_time)
        self.autotune_choice: dict[str, tuple[int, float]] = {}
        # corner-expanded grids for tracking, reused across the frames
        # between two mapping calls (the grids only change when a mapping
        # call commits; re-expanding per tracked frame costs ~1-2 ms/frame)
        self._tracking_grids = None
        self._prepare_tracking = None

        # sync method + device pipeline (see module docstring).  Tracking
        # and the 2-device pipeline use PROCESS-LOCAL devices (under a
        # multi-process runtime jax.devices() lists other hosts' devices,
        # which this process cannot device_put to); the sharded-mapping
        # mesh below spans the GLOBAL device list.
        self.sync_method = cfg.get('sync_method', 'strict')
        devs = jax.local_devices()
        if self.sync_method == 'free' and len(devs) == 1 \
                and not bool(cfg.get('sync_force_free', False)):
            # MEASURED fence (BASELINE.md round-4 sync rows): on ONE chip
            # 'free' is strictly worse than 'loose' — 328 s vs 174 s wall
            # at the 100-frame Replica budget (tracked_fps 0.41 vs 0.92)
            # at identical accuracy (0.60 cm both), because the ungated
            # back-to-back mapping commits invalidate the tracker's grid
            # snapshot every frame and single-chip contention serializes
            # the re-expansions against mapping.  The reference's free
            # mode assumes tracker and mapper own separate executors
            # (Tracker.py:183-192); with two local devices ours does too.
            # `sync_force_free: true` keeps genuine free on one chip.
            import warnings
            warnings.warn(
                "sync_method: 'free' on a single local device runs "
                "strictly slower than 'loose' at equal accuracy "
                "(measured, BASELINE.md round-4) — using 'loose'; set "
                "sync_force_free: true to override", UserWarning,
                stacklevel=2)
            self.sync_method = 'loose'
        self.track_device = devs[0]
        self.map_device = (devs[1] if self.sync_method != 'strict'
                           and len(devs) > 1 else devs[0])

        # multi-device mapping backend (config `parallel.map`):
        #   'none' - single-device mapping (default)
        #   'kf'   - keyframe-sharded over a global mesh (the multi-host
        #            axis, parallel/distributed.py): window frames split
        #            across devices, each PROCESS feeds only its local
        #            frames; draw-identical to single-device
        #   'rays' - ray-sharded (parallel/sharded.py): every device draws
        #            its own pixel subset, grads psum
        pcfg = cfg.get('parallel', {}) or {}
        self.par_map = pcfg.get('map', 'none')
        self.par_mesh = None
        if self.par_map != 'none':
            gdevs = jax.devices()    # GLOBAL: the mesh spans every process
            n_par = int(pcfg.get('devices', 0)) or len(gdevs)
            if self.par_map == 'kf':
                from nice_slam_tpu.parallel.distributed import kf_mesh
                self.par_mesh = kf_mesh(gdevs[:n_par])
            elif self.par_map == 'rays':
                from nice_slam_tpu.parallel.mesh import make_ray_mesh
                self.par_mesh = make_ray_mesh(n_par, devices=gdevs)
            else:
                raise ValueError(f'parallel.map: {self.par_map}')
            # sharded mapping owns the devices; the 2-device pipeline and
            # per-frame device cache are single-device mechanisms
            self.map_device = self.track_device
        # ray-sharded TRACKING (config `parallel.track: rays`): every
        # device renders tracking.pixels / n_devices rays per iteration,
        # loss/grads psum over ICI — draw-identical to the single-device
        # program (parallel/sharded.sharded_tracking_loss).  This is the
        # multi-chip lever for tracking-bound budgets (the TUM config's
        # 5000 px x 200 iters is gather-bound and embarrassingly
        # ray-parallel — BASELINE.md round-4 row-gather cost law).
        self.par_track = pcfg.get('track', 'none')
        self.par_track_mesh = None
        if self.par_track != 'none':
            if self.par_track != 'rays':
                raise ValueError(f'parallel.track: {self.par_track}')
            gdevs = jax.devices()
            n_par = int(pcfg.get('devices', 0)) or len(gdevs)
            from nice_slam_tpu.parallel.mesh import make_ray_mesh
            self.par_track_mesh = make_ray_mesh(n_par, devices=gdevs)
            if self.tcfg.pixels % self.par_track_mesh.devices.size:
                raise ValueError(
                    f'parallel.track: rays needs tracking.pixels '
                    f'({self.tcfg.pixels}) divisible by the mesh size '
                    f'({self.par_track_mesh.devices.size})')
            # the tracking shard_map owns the devices — no 2-dev pipeline
            self.map_device = self.track_device
        # (frame_idx, one mapping output leaf) of a dispatched-but-not-yet-
        # consumed mapping call; the tracker refreshes its snapshot from
        # self.grids when this is ready (or the loose gate forces it)
        self._pending_refresh: tuple[int, jnp.ndarray] | None = None
        if self.map_device is not self.track_device and nice:
            # frustum-mask node coordinates live with the mapper
            self._grid_points = jax.device_put(self._grid_points,
                                               self.map_device)
        self.timers = PhaseTimers()
        self.mapping_idx = -1
        self.selected_keyframes: dict[int, list] = {}

        # cadences (mapping.*, NICE_SLAM wiring)
        m = cfg['mapping']
        self.ckpt_freq = int(m.get('ckpt_freq', 500))
        # ckpt.compress_images: false -> bit-faithful resume (see utils/ckpt)
        self.ckpt_compress = bool(
            cfg.get('ckpt', {}).get('compress_images', True))
        self.mesh_freq = int(m.get('mesh_freq', 50))
        self.no_mesh_first = bool(m.get('no_mesh_on_first_frame', True))
        self.no_log_first = bool(m.get('no_log_on_first_frame', True))
        self.gt_camera = bool(cfg['tracking'].get('gt_camera', False))
        if True:
            from nice_slam_tpu.mesh.mesher import Mesher, MesherConfig
            me = cfg.get('meshing', {})
            self.mesher = Mesher(MesherConfig(
                resolution=int(me.get('resolution', 256)),
                level_set=float(me.get('level_set', 0.0)),
                clean_mesh=bool(me.get('clean_mesh', True)),
                depth_test=bool(me.get('depth_test', False)),
                mesh_coarse_level=bool(me.get('mesh_coarse_level', False)),
                clean_mesh_bound_scale=float(
                    me.get('clean_mesh_bound_scale', 1.02)),
                get_largest_components=bool(
                    me.get('get_largest_components', False)),
                remove_small_geometry_threshold=float(
                    me.get('remove_small_geometry_threshold', 0.2)),
                color_mesh_extraction_method=me.get(
                    'color_mesh_extraction_method', 'direct_point_query'),
                # the reference scales the MC bound by the global scale
                # factor (Mesher.__init__)
                marching_cubes_bound=tuple(
                    tuple(float(v) * float(cfg.get('scale', 1.0))
                          for v in b)
                    for b in cfg['mapping'].get(
                        'marching_cubes_bound', self.gcfg.bound)),
                scale=float(cfg.get('scale', 1.0)),
                # the 256^3..512^3 lattice query shards over a configured
                # device mesh (SURVEY §7.1; the reference's hot loop,
                # Mesher.py:569-575); >1 device only — on one device the
                # shard_map wrapper is pure overhead — and PROCESS-LOCAL
                # meshes only: the mesher uploads host points from this
                # process, which a multi-host shard_map cannot consume
                # (each rank extracts its own full mesh instead)
            ), self.model, self.intr, rcfg=self.rcfg,
               sharded_mesh=next(
                   (m for m in (self.par_mesh, self.par_track_mesh)
                    if m is not None and 1 < m.devices.size
                    and all(d.process_index == jax.process_index()
                            for d in m.devices.flat)), None))
        self.eval_rec = bool(cfg.get('meshing', {}).get('eval_rec', False))
        self.mesh_async = bool(cfg.get('meshing', {}).get('async', True))
        self._mesh_pool = None
        self._mesh_future = None
        self.save_selected_keyframes = bool(
            cfg['mapping'].get('save_selected_keyframes_info', False))
        from nice_slam_tpu.utils.visualizer import Visualizer
        vis_name = 'vis' if 'Demo' in self.output else 'tracking_vis'
        self.track_vis = Visualizer(
            os.path.join(self.output, vis_name),
            cfg['tracking'].get('vis_freq', 50), model=self.model,
            rcfg=self.rcfg, intr=self.intr, verbose=self.verbose)
        self.map_vis = None
        if 'Demo' not in self.output:
            self.map_vis = Visualizer(
                os.path.join(self.output, 'mapping_vis'),
                cfg['mapping'].get('vis_freq', 50), model=self.model,
                rcfg=self.rcfg, intr=self.intr, verbose=self.verbose)
        self.vis_enabled = bool(cfg.get('enable_vis', True))
        # live dashboard while the run executes (the reference's
        # visualizer.py shows the reconstruction AS IT RUNS; utils/live.py)
        vcfg = cfg.get('visualization', {}) or {}
        self.live = None
        self._last_panel: str | None = None
        if vcfg.get('live'):
            from nice_slam_tpu.utils.live import LiveViewer
            self.live = LiveViewer(
                os.path.join(self.output, 'live'), self.intr,
                freq=int(vcfg.get('live_freq', 5)),
                port=vcfg.get('live_port'))
        # aux subsystem #2 (SURVEY.md §5): the reference's safety is
        # by-construction single-writer discipline; here state is functional,
        # and this optional mode asserts the invariants every step
        self.check_invariants = bool(
            cfg.get('debug', {}).get('check_invariants', False))
        # aux subsystem #5 (SURVEY.md §5): structured per-frame scalar log
        self.metrics_path = os.path.join(self.output, 'metrics.jsonl')
        self._metrics_f = None
        # aux subsystem #1: optional JAX profiler trace
        self.profile_dir = cfg.get('debug', {}).get('profile_dir')

    # ------------------------------------------------------------------
    # pretrained decoder import
    # ------------------------------------------------------------------

    def _maybe_load_pretrain(self, params, pre_cfg: dict):
        """Load ConvONet-pretrained middle/fine (and coarse) decoders when
        the checkpoint files exist (NICE_SLAM.py:210-241); silently keep the
        random init otherwise (the from-scratch fallback — the reference
        checkout ships no blobs)."""
        mf = pre_cfg.get('middle_fine')
        if mf and os.path.exists(mf):
            from nice_slam_tpu.models.pretrain import load_torch_pretrain
            params = load_torch_pretrain(params, pre_cfg,
                                         coarse=self.dcfg.coarse)
            if self.verbose:
                print('INFO: loaded pretrained decoders')
        return params

    # ------------------------------------------------------------------
    # helpers
    # ------------------------------------------------------------------

    def _device_frame(self, idx, color_np, depth_np, device=None):
        key = (idx, None if device is None else device.id)
        if key not in self._kf_device:
            c, d = jnp.asarray(color_np), jnp.asarray(depth_np)
            if device is not None:
                c, d = jax.device_put((c, d), device)
            self._kf_device[key] = (c, d)
        return self._kf_device[key]

    def _cam7(self, c2w_np: np.ndarray) -> jnp.ndarray:
        return tensor_from_c2w(jnp.asarray(c2w_np[:3, :4]))

    def full_dec_params(self):
        if not self.nice:
            return self.opt_dec['imap']
        return {**self.frozen_dec, **self.opt_dec}

    def _tracking_snapshot(self):
        """(decoder params, color-stage corner-expanded grids) for tracking,
        snapshotted onto the tracking device and cached until the tracker
        consumes the next mapping update (the reference's
        update_para_from_mapping deepcopy+clone, Tracker.py:137-149)."""
        if self._tracking_grids is None:
            grids = self.grids if self.nice else None
            params = self.full_dec_params()
            if self.map_device is not self.track_device:
                grids, params = jax.device_put((grids, params),
                                               self.track_device)
            if self.nice:
                if self._prepare_tracking is None:
                    from nice_slam_tpu.models.grids import prepare_grids
                    shapes = self.model.grid_shapes
                    enable = self.model.expanded

                    # jitted: an EAGER pallas expansion dispatch costs
                    # ~0.4 s/call on the axon stack vs ~1 ms compiled.
                    # The salt (a traced-arg add, folded by XLA) plus a
                    # fresh jit wrapper re-rolls the compile: this program
                    # is bandwidth-bound and XLA's draw on it has varied
                    # 7x (BENCH_r02: 103 GB/s vs 770 GB/s binaries).
                    def build(s):
                        def f(g):
                            g = jax.tree.map(
                                lambda x: x + jnp.float32(s) * 0.0, g)
                            return prepare_grids(g, shapes, enable=enable,
                                                 stage='color')
                        return jax.jit(f)

                    if jax.default_backend() != 'tpu' or not enable:
                        self._prepare_tracking = build(0)
                    else:
                        # threshold from the data actually moved, at 45% of
                        # HBM peak — DERIVED, not guessed (round 4,
                        # scripts/studies/proto_expand_roofline.py): this
                        # stack's pallas pure-copy floor is 0.79 peak; the
                        # 1-read:8-write widen structure drops to 0.61-0.63;
                        # the y/z shifts to 0.53; the second (x+1) plane
                        # read to 0.43-0.46 — the shipped kernel sits AT its
                        # algorithm's structural floor, so a good binary
                        # sustains 0.43-0.47 peak and 0.45 separates it
                        # from the ~4x-slow bad draws
                        out_sd = jax.eval_shape(
                            lambda g: prepare_grids(
                                g, shapes, enable=enable, stage='color'),
                            grids)
                        nbytes = sum(
                            int(np.prod(x.shape)) * x.dtype.itemsize
                            for t in (grids, out_sd)
                            for x in jax.tree.leaves(t))
                        # the 1.5 ms floor covers multi-output dispatch
                        # overhead beyond the noop probe (tiny test grids
                        # are dispatch-bound, not bandwidth-bound)
                        thr = (max(nbytes / (0.45 * HBM_PEAK_GBPS * 1e9),
                                   1.5e-3) + self._dispatch_latency())
                        self._prepare_tracking = self._autotune(
                            build, (grids,), thr, 4, 'grid-expand', reps=10)
                grids = self._prepare_tracking(grids)
            if self.par_track_mesh is not None:
                # replicate the snapshot onto the tracking mesh ONCE per
                # mapping commit (the broadcast is the expanded tables —
                # up to ~GB at TUM scale — so it must not happen per frame)
                from nice_slam_tpu.parallel.sharded import replicate_to_mesh
                params, grids = replicate_to_mesh((params, grids),
                                                  self.par_track_mesh)
            self._tracking_grids = (params, grids)
        return self._tracking_grids

    # ------------------------------------------------------------------
    # tracking
    # ------------------------------------------------------------------

    def track(self, idx: int, color_np, depth_np, gt_c2w_np) -> np.ndarray:
        """Track one frame; returns the estimated 4x4 c2w
        (Tracker.run :151-299)."""
        t0 = time.perf_counter()
        if self.par_track_mesh is not None:
            # replicated upload onto the tracking mesh (one broadcast;
            # the single-device _device_frame cache is bypassed)
            from nice_slam_tpu.parallel.sharded import replicate_to_mesh
            color, depth = replicate_to_mesh(
                (np.asarray(color_np), np.asarray(depth_np)),
                self.par_track_mesh)
        else:
            color, depth = self._device_frame(idx, color_np, depth_np)

        # overlapped modes: consume a finished (or gate-forced) mapping
        # update; otherwise keep rendering against the current snapshot
        if self._pending_refresh is not None:
            pidx, leaf = self._pending_refresh
            gate = self.mcfg.every_frame + self.mcfg.every_frame // 2
            forced = (self.sync_method == 'loose' and idx - pidx > gate)
            if forced:
                jax.block_until_ready(leaf)
            if forced or leaf.is_ready():
                self._tracking_grids = None
                self._pending_refresh = None

        if idx == 0 or self.gt_camera:
            c2w = gt_c2w_np
        else:
            pre = self.estimate_c2w[idx - 1]
            if self.tcfg.const_speed and idx >= 2:
                guess = np.asarray(const_speed_init(
                    jnp.asarray(pre), jnp.asarray(self.estimate_c2w[idx - 2])))
            else:
                guess = pre
            cam7 = self._cam7(guess)

            self.key, sub = jax.random.split(self.key)
            params_t, grids_t = self._tracking_snapshot()
            if self._track_fn is None:
                self._track_fn = self._autotune_track_fn(
                    (params_t, grids_t, color, depth, cam7, sub))
            best_cam7, _, losses = self._track_fn(
                params_t, grids_t, color, depth, cam7, sub)
            c2w = np.eye(4, dtype=np.float32)
            c2w[:3, :4] = np.asarray(c2w_from_tensor_4x4(best_cam7))[:3, :4]
            if self.verbose:
                l0, l1 = float(losses[0]), float(losses[-1])
                print(f'Tracking frame {idx}: loss {l0:.2f} -> {l1:.2f}')

        self.estimate_c2w[idx] = c2w
        self.gt_c2w[idx] = gt_c2w_np
        self.timers.track_s += time.perf_counter() - t0
        self.timers.frames_tracked += 1
        if self.vis_enabled and idx > 0:
            panel = self.track_vis.vis(idx, 0, depth_np, color_np, c2w,
                                       self.full_dec_params(),
                                       self.grids if self.nice else None)
            self._last_panel = panel or self._last_panel
        return c2w

    @staticmethod
    def _fetch(out) -> float:
        """Value-fetch barrier: `jax.block_until_ready` does NOT reliably
        synchronize with device execution for small programs on this stack
        (BASELINE.md measurement hazards); only a value fetch is a
        trustworthy barrier.  Consumes one scalar of the first leaf; for
        multi-process global arrays, of the first LOCAL shard (fetching a
        remote shard would need a collective)."""
        leaf = jax.tree.leaves(out)[0]
        if not getattr(leaf, 'is_fully_addressable', True):
            return float(np.asarray(
                leaf.addressable_shards[0].data).ravel()[0])
        return float(jnp.ravel(leaf)[0])

    def _fetch_baseline(self) -> float:
        """Flat cost of the fetch barrier (~26 ms tunnel round-trip on
        axon, regardless of size): one trivial dispatch + scalar fetch,
        min over trials.  Subtracted from every probe wall time."""
        if self._fetch_base_s is None:
            tiny = jnp.zeros((8,))
            tiny_fn = jax.jit(lambda v: jnp.sum(v) * 0.0)
            float(tiny_fn(tiny))   # compile + warm
            best = float('inf')
            for _ in range(5):
                t0 = time.perf_counter()
                float(tiny_fn(tiny))
                best = min(best, time.perf_counter() - t0)
            self._fetch_base_s = best
        return self._fetch_base_s

    def _dispatch_latency(self) -> float:
        """Per-call dispatch latency of this stack (the axon tunnel costs
        ~2.5 ms per dispatch); measured once, used by the autotune probes
        to separate kernel time from launch overhead.  Derived as the
        slope between a 10-call chain and a 1-call chain, each closed by
        a value fetch, so the flat fetch cost cancels."""
        if self._dispatch_s is None:
            noop = jax.jit(lambda x: x + 1.0)
            x = noop(jnp.zeros((8,)))
            float(x[0])            # compile + warm

            def chain(n):
                best = float('inf')
                for _ in range(3):
                    y = x
                    t0 = time.perf_counter()
                    for _ in range(n):
                        y = noop(y)
                    float(y[0])
                    best = min(best, time.perf_counter() - t0)
                return best

            self._dispatch_s = max((chain(10) - chain(1)) / 9, 1e-4)
        return self._dispatch_s

    def _autotune(self, build, example_args, threshold_s, candidates, tag,
                  reps=3):
        """Generic compile-quality re-roll.

        TPU compile quality on this stack is nondeterministic (identical
        HLO has produced ~9 ms and ~50 ms tracking binaries, and a 7x-slow
        grid-expansion kernel — buffer-layout assignment).  `build(salt)`
        returns a freshly jitted program (a new jit wrapper re-rolls the
        in-process compile; the salt additionally perturbs the
        persistent-cache key where that cache is enabled).  Each candidate
        is timed on `example_args` behind a value-fetch barrier (see
        `_fetch` — block_until_ready under-reports small programs on this
        stack) with the flat fetch cost subtracted; the best is kept,
        stopping early once a draw beats `threshold_s`."""
        base_s = self._fetch_baseline()
        best_fn, best_t, best_s = None, float('inf'), 0
        for s in range(candidates):
            fn = build(s)
            self._fetch(fn(*example_args))   # compile + warm
            dt = float('inf')
            for _ in range(2):
                t0 = time.perf_counter()
                for _ in range(reps):
                    out = fn(*example_args)
                self._fetch(out)
                dt = min(dt, (time.perf_counter() - t0 - base_s) / reps)
            dt = max(dt, 1e-6)
            # multi-process runs: every rank compiled its OWN binary for
            # this salt; agree on the WORST rank's time so all ranks take
            # identical keep/re-roll branches (a binary slow on any rank
            # stalls the whole collective step anyway).  Lockstep is
            # preserved because every rank runs the same candidate loop
            # and branches on the same agreed value.
            dt = self._agree_time(dt)
            if dt < best_t:
                best_fn, best_t, best_s = fn, dt, s
            if best_t <= threshold_s:
                break
            if self.verbose:
                print(f'INFO: {tag} binary draw {s}: '
                      f'{dt * 1e3:.1f} ms (re-rolling compile)')
        self.autotune_choice[tag] = (best_s, best_t)
        return best_fn

    @staticmethod
    def _agree_time(dt: float) -> float:
        """Max of `dt` over all processes (identity single-process).

        Used by `_autotune` so multi-host ranks agree on one probe
        verdict — the round-2/3 bypass (`build(0)` under a mesh) meant
        exactly the multi-host runs took whatever binary XLA drew."""
        if jax.process_count() == 1:
            return dt
        from jax.experimental import multihost_utils
        times = multihost_utils.process_allgather(
            jnp.asarray([dt], jnp.float32))
        return float(np.max(np.asarray(times)))

    def _autotune_track_fn(self, example_args):
        """Compile the tracking program, re-rolling slow binary draws.
        A probe costs ~0.2 s; a re-roll costs one compile and only happens
        when the first draw was bad.  Off-TPU (CPU test runs) the probe is
        skipped entirely."""
        if self.par_track_mesh is not None:
            from nice_slam_tpu.parallel.sharded import \
                make_sharded_track_frame
            build = lambda s: make_sharded_track_frame(
                mesh=self.par_track_mesh, model=self.model, rcfg=self.rcfg,
                tcfg=self.tcfg, intr=self.intr, salt=s)
        else:
            build = lambda s: make_track_frame(
                model=self.model, rcfg=self.rcfg, tcfg=self.tcfg,
                intr=self.intr, salt=s)
        if jax.default_backend() != 'tpu':
            return build(0)
        # "fast binary" accept threshold, modelled from MEASURED good
        # binaries across the shipped budgets (BASELINE.md):
        #   * ray-bound term: ~4 us per px*iter (Replica 200x10 -> 8-10 ms
        #     in today's draw pool; TUM 5000x200 -> 4.0 s; Demo 1000x30
        #     -> 110 ms), with 30% headroom => 5.2 us per px*iter;
        #   * per-iteration dispatch/overhead floor: 1.3 ms/iter (binds on
        #     small-batch budgets — Apartment 200px x 50 runs 62 ms);
        #   * 9 ms absolute floor.
        # The previous 25 * (budget/2000)^0.85 form sat ~4x above the good
        # binary at the Replica budget, so 16+ ms draws were ACCEPTED
        # without a re-roll — the round-4/5 bench regressions
        # (BENCH_r04 16.08, r5 first draws 13.9-15.5 fps) were exactly
        # such draws (scripts/studies/proto_track_draws.py measures the
        # pool).
        budget = self.tcfg.pixels * self.tcfg.iters
        default_ms = max(9.0, 1.3 * self.tcfg.iters, 5.2e-3 * budget)
        threshold_s = (float(self.cfg.get('tracking', {})
                             .get('autotune_ms', default_ms)) / 1e3
                       + self._dispatch_latency())
        return self._autotune(
            build, example_args, threshold_s,
            int(self.cfg.get('tracking', {}).get('autotune_candidates', 5)),
            'tracking')

    def _autotune_map_fn(self, build, example_args, n_iters, pixels):
        """Compile the mapping program, re-rolling slow binary draws — the
        same nondeterminism as the tracking program but with a much heavier
        compile (~30-60 s), so the default candidate count is 2 and the
        threshold scales with the pixel budget.  Skipped off-TPU.  Under a
        device mesh the probe runs rank-synchronized: every rank times its
        own binary on the same candidate schedule and the verdict is the
        allgathered worst-rank time (`_agree_time`), so all ranks keep or
        re-roll together — no divergence, no bypass."""
        if jax.default_backend() != 'tpu':
            return build(0)
        # tiny workloads (sub-half-Replica ray-sample budgets) are
        # dispatch/overhead-bound: the pixels-scaled threshold mispredicts
        # there and a re-roll can't help — skip straight to one compile
        if pixels * (self.rcfg.n_samples + self.rcfg.n_surface) < 24000:
            return build(0)
        # good binaries measured: NICE 1000 px -> ~4.6 ms/iter, iMAP*
        # 5000 px (hidden-256 MLP) -> ~33 ms/iter; thresholds sit ~30%
        # above those, scaling linearly with the per-iteration ray count
        base_ms = 6.0 if self.nice else 12.0
        per_iter_ms = float(self.cfg.get('mapping', {}).get(
            'autotune_ms_per_iter', base_ms * max(1.0, pixels / 1000.0)))
        thr = n_iters * per_iter_ms / 1e3 + self._dispatch_latency()
        cands = int(self.cfg.get('mapping', {}).get('autotune_candidates', 2))
        return self._autotune(build, example_args, thr, cands, 'mapping',
                              reps=2)

    # ------------------------------------------------------------------
    # mapping
    # ------------------------------------------------------------------

    def _select_window(self, store: KeyframeStore, mcfg: MapperConfig,
                       window_size: int, idx, color_np, depth_np, cur_c2w):
        """Window = selected keyframes + newest keyframe + current frame
        (Mapper.py:321-338).  Returns (kf_positions, oldest_pos)."""
        if len(store) == 0:
            return [], None
        k = window_size - 2
        if mcfg.keyframe_selection == 'global':
            sel = store.select_global(self.np_rng, k)
        else:
            sel = store.select_overlap(
                self.np_rng, k, depth_np, cur_c2w, self.intr)
        sel = sel + [len(store) - 1]
        oldest = min(sel)
        return sel, oldest

    def _frustum_masks(self, cur_c2w, depth_dev):
        masks = {}
        c2w_dev = jnp.asarray(cur_c2w)
        for name in self.grids:
            if name == 'coarse':
                masks[name] = jnp.ones((self.grids[name].shape[0], 1),
                                       jnp.float32)
            else:
                m = frustum_mask(self._grid_points[name], c2w_dev,
                                 depth_dev, self.intr)
                masks[name] = m[:, None]
        return masks

    def map_frame(self, idx: int, color_np, depth_np, gt_c2w_np, *,
                  coarse: bool = False, first: bool = False) -> None:
        """One mapping invocation (Mapper.run :671-806)."""
        t0 = time.perf_counter()
        mcfg = self.coarse_mcfg if coarse else self.mcfg
        store = self.coarse_keyframes if coarse else self.keyframes
        map_dev = (self.map_device
                   if self.map_device is not self.track_device else None)
        color, depth = self._device_frame(idx, color_np, depth_np,
                                          device=map_dev)
        cur_c2w = self.estimate_c2w[idx].copy()

        refine = (idx == self.n_img - 1 and mcfg.color_refine
                  and not coarse and not first)
        window_size = mcfg.window_size
        fix_color = mcfg.fix_color
        frustum_on = mcfg.frustum_selection and self.nice
        middle_ratio, fine_ratio = mcfg.middle_iter_ratio, mcfg.fine_iter_ratio
        if refine:
            outer_iters = 5
            window_size = mcfg.window_size * 2
            middle_ratio = fine_ratio = 0.0
            n_iters = mcfg.iters * 5 // outer_iters
            fix_color = True
            frustum_on = False
            lr_factor = mcfg.lr_factor
        elif first:
            outer_iters = 1
            n_iters = mcfg.iters_first
            lr_factor = mcfg.lr_first_factor
        else:
            outer_iters = 1 if self.nice else 3
            n_iters = mcfg.iters // outer_iters
            lr_factor = mcfg.lr_factor

        # XLA compile time grows superlinearly with scan length on this
        # stack (400 iterations: ~246 s; 10: ~20 s), so every call runs as
        # chunks of the NORMAL per-call iteration count with the Adam state
        # threaded through — the 1500-iteration first-frame mapping then
        # reuses the same compiled program as every later call.
        chunk_iters = max(mcfg.iters // (1 if self.nice else 3), 1)
        chunk_iters = min(chunk_iters, n_iters)

        # in-iteration render panels (Mapper.py:527, vis_freq x
        # vis_inside_freq): on vis frames, chunk at inside_freq granularity
        # so the panels render mid-optimization like the reference
        vis_inside = int(self.cfg['mapping'].get('vis_inside_freq', 0))
        vis_freq = int(self.cfg['mapping'].get('vis_freq', 0))
        do_inside_vis = (
            self.vis_enabled and self.map_vis is not None and not coarse
            and vis_freq > 0 and vis_inside > 0 and idx % vis_freq == 0
            and (idx > 0 or not self.cfg['mapping'].get(
                'no_vis_on_first_frame', True)))
        if do_inside_vis:
            chunk_iters = min(chunk_iters, max(vis_inside, 1))

        mcfg_eff = mcfg._replace(middle_iter_ratio=middle_ratio,
                                 fine_iter_ratio=fine_ratio,
                                 fix_color=fix_color)

        for outer in range(outer_iters):
            ba = (len(store) > 4) and mcfg.ba and not coarse
            sel, oldest = self._select_window(
                store, mcfg_eff, window_size, idx, color_np, depth_np,
                cur_c2w)
            if self.save_selected_keyframes and not coarse:
                info = [{'idx': store.frames[p].idx,
                         'gt_c2w': store.frames[p].gt_c2w,
                         'est_c2w': store.frames[p].est_c2w} for p in sel]
                info.append({'idx': idx, 'gt_c2w': np.asarray(gt_c2w_np),
                             'est_c2w': cur_c2w})
                self.selected_keyframes[idx] = info

            # build window arrays: selected keyframes then the current
            # frame.  Keyframe-sharded mapping keeps frames on the host
            # here (each process uploads only its shard below), bypassing
            # the per-frame device cache.
            kf_par = self.par_mesh is not None and self.par_map == 'kf'
            colors, depths, cam7s, cam_mask = [], [], [], []
            for pos in sel:
                kf = store.frames[pos]
                if kf_par:
                    c_dev, d_dev = kf.color, kf.depth
                else:
                    c_dev, d_dev = self._device_frame(
                        kf.idx, kf.color, kf.depth, device=map_dev)
                colors.append(c_dev)
                depths.append(d_dev)
                cam7s.append(self._cam7(kf.est_c2w))
                cam_mask.append(0.0 if pos == oldest else 1.0)
            colors.append(color_np.astype(np.float32) if kf_par else color)
            depths.append(depth_np.astype(np.float32) if kf_par else depth)
            cam7s.append(self._cam7(cur_c2w))
            cam_mask.append(1.0)
            real_n = len(colors)
            # Pad the window to its static size by CYCLING the real frames,
            # so one compiled program serves every fill level (window
            # growth was costing a fresh ~60 s XLA compile per new size).
            # Each unique frame keeps the reference's total pixel budget:
            # slots x (pixels / window) ~= pixels / real_n per frame
            # (exact when window % real_n == 0; any remainder slots go to
            # the NEWEST frames — current frame first — not the oldest).
            # Duplicate slots are pose-frozen; the primary slot carries
            # any BA update.
            n_frames = max(window_size, real_n)
            if self.par_mesh is not None:
                # sharded window: frame count must tile the mesh
                n_dev = self.par_mesh.devices.size
                n_frames = -(-n_frames // n_dev) * n_dev
            for k in range(n_frames - real_n):
                src = real_n - 1 - (k % real_n)
                colors.append(colors[src])
                depths.append(depths[src])
                cam7s.append(cam7s[src])
                cam_mask.append(0.0)
            if not ba:
                cam_mask = [0.0] * n_frames

            pix_per_frame = max(mcfg.pixels // n_frames, 1)
            masks = (self._frustum_masks(cur_c2w, depth)
                     if frustum_on else None)

            # decoder trainability for this call (color_refine freezes color)
            opt_dec = dict(self.opt_dec)
            if fix_color and 'color' in opt_dec:
                self.frozen_dec = {**self.frozen_dec,
                                   'color': opt_dec.pop('color')}

            cache_key = (coarse, n_frames, chunk_iters, pix_per_frame,
                         frustum_on, tuple(sorted(opt_dec)), self.par_map)
            if cache_key not in self._map_fns:
                from nice_slam_tpu.utils.optim import adam_init
                # adam_init is jitted so every chunk (including the first)
                # calls the SAME state-threading variant of the program —
                # one heavy compile, not a None-state variant plus this one
                kwargs = dict(model=self.model, rcfg=self.rcfg,
                              mcfg=mcfg_eff, intr=self.intr,
                              n_frames=n_frames, n_iters=chunk_iters,
                              pix_per_frame=pix_per_frame)
                if self.par_mesh is None:
                    builder = (lambda s=0, kw=kwargs:
                               make_map_step(**kw, salt=s))
                elif self.par_map == 'kf':
                    from nice_slam_tpu.parallel.distributed import \
                        make_kf_sharded_map_step
                    builder = (lambda s=0, kw=kwargs:
                               make_kf_sharded_map_step(
                                   mesh=self.par_mesh, **kw))
                else:
                    from nice_slam_tpu.parallel.sharded import \
                        make_sharded_map_step
                    builder = (lambda s=0, kw=kwargs:
                               make_sharded_map_step(
                                   mesh=self.par_mesh, **kw))
                # step is compiled lazily below (the autotune probe needs
                # the first call's real operands as example args)
                self._map_fns[cache_key] = [None, jax.jit(adam_init),
                                            builder]
            map_entry = self._map_fns[cache_key]
            map_fn, init_fn = map_entry[0], map_entry[1]

            # full-length schedules, sliced per chunk; the tail chunk pads
            # with zero-lr iterations (no parameter/moment effect persists —
            # the Adam state dies with this call)
            n_chunks = -(-n_iters // chunk_iters)
            pad_it = n_chunks * chunk_iters - n_iters
            lr_full = lr_table(mcfg_eff, n_iters, lr_factor, self.nice, ba)
            stage_full = stage_schedule(mcfg_eff, n_iters, self.nice)
            if pad_it:
                lr_full = np.concatenate(
                    [lr_full, np.zeros((pad_it, lr_full.shape[1]),
                                       lr_full.dtype)])
                stage_full = np.concatenate(
                    [stage_full, np.repeat(stage_full[-1:], pad_it)])

            opt_params = {
                'cams': jnp.stack(cam7s),
                'grids': self.grids,
                'dec': opt_dec,
            }
            self.key, sub = jax.random.split(self.key)
            frozen_dec = self.frozen_dec
            if map_dev is not None:
                # two-device pipeline: pin the mapping operands to the
                # mapping device (uncommitted operands follow; the grids
                # already live there after the first call)
                opt_params, frozen_dec, masks, sub = jax.device_put(
                    (opt_params, frozen_dec, masks, sub), map_dev)
            cam_mask_d = jnp.asarray(cam_mask)
            if kf_par:
                # each process uploads ONLY its local frame shard
                from nice_slam_tpu.parallel.distributed import \
                    window_to_global
                f_local = n_frames // jax.process_count()
                lo = jax.process_index() * f_local
                colors_d, depths_d = window_to_global(
                    self.par_mesh,
                    np.stack(colors[lo:lo + f_local]),
                    np.stack(depths[lo:lo + f_local]))
            else:
                colors_d = jnp.stack(colors)
                depths_d = jnp.stack(depths)
            opt_state, loss_chunks = init_fn(opt_params), []
            if map_fn is None:
                map_fn = self._autotune_map_fn(
                    map_entry[2],
                    (opt_params, frozen_dec, masks,
                     jnp.asarray(lr_full[:chunk_iters]),
                     jnp.asarray(stage_full[:chunk_iters]), cam_mask_d,
                     colors_d, depths_d, sub, opt_state),
                    chunk_iters, mcfg.pixels)
                map_entry[0], map_entry[2] = map_fn, None
            for c in range(n_chunks):
                if do_inside_vis and (c * chunk_iters) % vis_inside == 0:
                    self.map_vis.vis(
                        idx, c * chunk_iters, depth_np, color_np, cur_c2w,
                        {**frozen_dec, **opt_params['dec']} if self.nice
                        else opt_params['dec'].get('imap'),
                        opt_params['grids'] if self.nice else None)
                sl = slice(c * chunk_iters, (c + 1) * chunk_iters)
                opt_params, opt_state, losses_c = map_fn(
                    opt_params, frozen_dec, masks,
                    jnp.asarray(lr_full[sl]), jnp.asarray(stage_full[sl]),
                    cam_mask_d, colors_d, depths_d,
                    jax.random.fold_in(sub, c), opt_state)
                loss_chunks.append(losses_c)
            losses = (loss_chunks[0] if n_chunks == 1
                      else jnp.concatenate(loss_chunks)[:n_iters])

            # commit state (dispatch-only: the arrays are futures; nothing
            # here blocks on device compute unless verbose/BA reads values)
            self.grids = opt_params['grids'] if self.nice else {}
            if coarse:
                pass  # tracking never samples the coarse grid
            elif self.sync_method != 'strict' and not ba:
                # overlapped modes: the tracker keeps its snapshot until
                # this call's outputs are ready (consumed in track())
                self._pending_refresh = (idx, losses)
            else:
                self._tracking_grids = None  # snapshot is stale
            for k in opt_dec:
                self.opt_dec[k] = opt_params['dec'][k]
            if ba:
                new_cams = np.asarray(
                    c2w_from_tensor_4x4(opt_params['cams']))
                for slot, pos in enumerate(sel):
                    if pos != oldest:
                        store.frames[pos].est_c2w = new_cams[slot]
                cur_c2w = new_cams[real_n - 1]   # current frame's slot
                self.estimate_c2w[idx] = cur_c2w

            if self.verbose:
                tag = 'Coarse mapping' if coarse else 'Mapping'
                print(f'{tag} frame {idx}: loss {float(losses[0]):.2f} -> '
                      f'{float(losses[-1]):.2f} ({n_iters} iters, '
                      f'window {n_frames})')

            # keyframe append on the last outer iteration (Mapper.py:753-758)
            if outer == outer_iters - 1:
                if (idx % mcfg.keyframe_every == 0
                        or idx == self.n_img - 2) \
                        and idx not in store.indices:
                    store.append(Keyframe(
                        idx=idx, color=color_np, depth=depth_np,
                        est_c2w=cur_c2w.copy(), gt_c2w=np.asarray(gt_c2w_np)))

            self.timers.map_iters += n_iters if not coarse else 0

        dt = time.perf_counter() - t0
        if coarse:
            self.timers.coarse_map_s += dt
        else:
            self.timers.map_s += dt
            self.timers.frames_mapped += 1
            self.mapping_idx = idx
            if self.vis_enabled and self.map_vis is not None and idx > 0:
                panel = self.map_vis.vis(idx, 0, depth_np, color_np,
                                         self.estimate_c2w[idx],
                                         self.full_dec_params(),
                                         self.grids if self.nice else None)
                self._last_panel = panel or self._last_panel

    # ------------------------------------------------------------------
    # services: checkpoint / mesh
    # ------------------------------------------------------------------

    def checkpoint_state(self) -> dict:
        return {
            'grids': self.grids,
            'opt_dec': self.opt_dec,
            'frozen_dec': self.frozen_dec,
            'estimate_c2w': self.estimate_c2w,
            'gt_c2w': self.gt_c2w,
            'keyframes': [vars(kf) for kf in self.keyframes.frames],
            'coarse_keyframe_indices': self.coarse_keyframes.indices,
            'selected_keyframes': (self.selected_keyframes
                                   if self.save_selected_keyframes else None),
            'mapping_idx': self.mapping_idx,
            # PRNG streams: restoring them makes the resumed run replay the
            # uninterrupted run's exact random draws (resume contract,
            # utils/ckpt.py).
            'key': np.asarray(self.key),
            'np_rng_state': self.np_rng.bit_generator.state,
        }

    def save_ckpt(self, idx: int) -> str:
        path = os.path.join(self.output, 'ckpts', f'{idx:05d}.ckpt')
        save_checkpoint(path, self.checkpoint_state(),
                        compress_images=self.ckpt_compress)
        if self.verbose:
            print(f'INFO: checkpoint saved to {path}')
        return path

    def restore(self, state: dict) -> int:
        """Resume from `checkpoint_state()` output; returns the next frame
        index to process (extension over the reference, which cannot
        resume)."""
        self.grids = {
            k: jnp.asarray(v).reshape(-1, v.shape[-1])
            for k, v in state['grids'].items()}
        self._tracking_grids = None
        self.opt_dec = jax.tree.map(jnp.asarray, state['opt_dec'])
        self.frozen_dec = jax.tree.map(jnp.asarray, state['frozen_dec'])
        self.estimate_c2w = np.asarray(state['estimate_c2w'])
        self.gt_c2w = np.asarray(state['gt_c2w'])
        self.keyframes = KeyframeStore(
            [Keyframe(idx=int(kf['idx']),
                      color=np.asarray(kf['color']),
                      depth=np.asarray(kf['depth']),
                      est_c2w=np.asarray(kf['est_c2w']),
                      gt_c2w=np.asarray(kf['gt_c2w']))
             for kf in state['keyframes']])
        for kf_idx in state.get('coarse_keyframe_indices', []):
            for kf in self.keyframes.frames:
                if kf.idx == kf_idx:
                    self.coarse_keyframes.append(kf)
        self.mapping_idx = int(state['mapping_idx'])
        if state.get('key') is not None:
            self.key = jnp.asarray(state['key'])
        if state.get('np_rng_state') is not None:
            self.np_rng = np.random.default_rng()
            self.np_rng.bit_generator.state = state['np_rng_state']
        if state.get('selected_keyframes'):
            self.selected_keyframes = dict(state['selected_keyframes'])
        return self.mapping_idx + 1

    def mesh_now(self, idx: int, final: bool = False) -> str | None:
        """Extract a mesh snapshot.  Periodic meshes run on a background
        thread (the reference meshes inside the mapper process, so its
        tracker never waits either, Mapper.py:781-785); the host-side work
        (marching tetrahedra, component filtering, PLY) overlaps the SLAM
        loop and the device work interleaves on the device queue.  Final
        meshes block.  One mesh in flight at a time."""
        if self.mesher is None:
            return None
        self.join_mesh()
        name = 'final_mesh.ply' if final else f'{idx:05d}_mesh.ply'
        path = os.path.join(self.output, 'mesh', name)
        # snapshot mutable state: keyframe poses (BA rewrites in place) and
        # the pose list; grids/params are immutable device arrays
        kfs = KeyframeStore([Keyframe(kf.idx, kf.color, kf.depth,
                                      kf.est_c2w.copy(), kf.gt_c2w)
                             for kf in self.keyframes.frames])
        est = self.estimate_c2w.copy()
        params, grids = self.full_dec_params(), self.grids

        def work():
            t0 = time.perf_counter()
            self.mesher.extract(path, params, grids, kfs, est, idx)
            self.timers.mesh_s += time.perf_counter() - t0

        if final or not self.mesh_async:
            work()
        else:
            import concurrent.futures
            if self._mesh_pool is None:
                self._mesh_pool = \
                    concurrent.futures.ThreadPoolExecutor(max_workers=1)
            self._mesh_future = self._mesh_pool.submit(work)
        return path

    def join_mesh(self) -> None:
        """Wait for any in-flight background mesh extraction."""
        if self._mesh_future is not None:
            self._mesh_future.result()
            self._mesh_future = None

    # ------------------------------------------------------------------
    # main loop
    # ------------------------------------------------------------------

    @property
    def map_cadence(self) -> int:
        """Frames between mapping rounds.  Strict maps exactly every
        `every_frame` (Tracker.py:176 / Mapper.py:687-689).  In 'loose'
        the reference's mapper re-fires as soon as the tracker is
        >= every_frame//2 past the last mapped frame (Mapper.py:690-692 —
        that gate exists only for strict_mapping=False AND the loose wait
        loop), and its mapping round is slower than every_frame//2 of its
        tracking, so the gate BINDS: the effective reference loose cadence
        is every_frame//2.  In 'free' the reference has NO cadence gate at
        all (its mapper loops continuously); a fixed every_frame//2 is our
        closest static approximation of that ungated continuous mapping —
        one compiled cadence rather than a data-dependent loop.  Matching
        costs one extra mapping round per every_frame vs strict (they
        overlap tracking); measured accuracy effect at the Demo budget is
        within seed noise (BASELINE.md round-4 head-to-head)."""
        if self.sync_method == 'strict':
            return self.mcfg.every_frame
        return max(1, self.mcfg.every_frame // 2)

    def step(self, idx: int) -> None:
        """Process one frame under the strict schedule."""
        _, color_np, depth_np, gt_c2w_np = self.frame_reader[idx]
        if idx == 0:
            self.estimate_c2w[0] = gt_c2w_np
            self.gt_c2w[0] = gt_c2w_np
            self.track(0, color_np, depth_np, gt_c2w_np)
            self.map_frame(0, color_np, depth_np, gt_c2w_np, first=True)
            if self.coarse_enabled:
                self.map_frame(0, color_np, depth_np, gt_c2w_np,
                               coarse=True, first=True)
        else:
            self.track(idx, color_np, depth_np, gt_c2w_np)
            if idx % self.map_cadence == 0 or idx == self.n_img - 1:
                if self.coarse_enabled:
                    self.map_frame(idx, color_np, depth_np, gt_c2w_np,
                                   coarse=True)
                self.map_frame(idx, color_np, depth_np, gt_c2w_np)

        # services at mapping cadence (Mapper.py:769-802)
        mapped = (idx == 0 or idx % self.map_cadence == 0
                  or idx == self.n_img - 1)
        if mapped:
            if ((idx % self.ckpt_freq == 0
                 and not (idx == 0 and self.no_log_first))
                    or idx == self.n_img - 1):
                self.save_ckpt(idx)
            if (idx % self.mesh_freq == 0
                    and not (idx == 0 and self.no_mesh_first)):
                self.mesh_now(idx)
            if idx == self.n_img - 1:
                self.mesh_now(idx, final=True)
                if self.eval_rec and self.mesher is not None:
                    t0 = time.perf_counter()
                    path = os.path.join(self.output, 'mesh',
                                        'final_mesh_eval_rec.ply')
                    self.mesher.extract(
                        path, self.full_dec_params(), self.grids,
                        self.keyframes, self.estimate_c2w, idx,
                        show_forecast=False, clean_mesh=True,
                        get_mask_use_all_frames=True)
                    self.timers.mesh_s += time.perf_counter() - t0

        if self.check_invariants:
            self._assert_invariants(idx)

        self._log_metrics(idx)
        if self.live is not None:
            self.live.update(idx, self.n_img, self.estimate_c2w,
                             self.gt_c2w,
                             mesh_dir=os.path.join(self.output, 'mesh'),
                             panel_path=self._last_panel,
                             timers=self.timers.summary())

        # release the device copies of non-keyframe images
        if idx not in self.keyframes.indices:
            for k in [k for k in self._kf_device if k[0] == idx]:
                del self._kf_device[k]

    def _log_metrics(self, idx: int) -> None:
        import json
        if self._metrics_f is None:
            self._metrics_f = open(self.metrics_path, 'a')
        gt_err = float(np.linalg.norm(
            self.estimate_c2w[idx][:3, 3] - self.gt_c2w[idx][:3, 3]))
        rec = {'frame': idx, 'pose_err_vs_gt': round(gt_err, 5),
               'mapped': self.mapping_idx == idx,
               'n_keyframes': len(self.keyframes),
               **self.timers.summary()}
        self._metrics_f.write(json.dumps(rec) + '\n')
        self._metrics_f.flush()

    def _assert_invariants(self, idx: int) -> None:
        """State-health checks (replaces the reference's implicit trust in
        its single-writer discipline): finite map state, valid pose."""
        for name, g in self.grids.items():
            assert bool(jnp.isfinite(g).all()), f'grid {name} has non-finite'
        for leaf in jax.tree.leaves(self.opt_dec):
            assert bool(jnp.isfinite(leaf).all()), 'decoder non-finite'
        c2w = self.estimate_c2w[idx]
        assert np.isfinite(c2w).all(), f'pose {idx} non-finite'
        rot = c2w[:3, :3]
        err = np.abs(rot @ rot.T - np.eye(3)).max()
        assert err < 1e-2, f'pose {idx} rotation not orthonormal ({err})'

    def run(self, start: int = 0) -> None:
        if self.profile_dir:
            import jax.profiler
            jax.profiler.start_trace(self.profile_dir)
        from nice_slam_tpu.io.prefetch import Prefetcher
        workers = int(self.cfg.get('data', {}).get(
            'prefetch_workers',
            getattr(self.frame_reader, 'prefetch_workers', 1)))
        reader, self.frame_reader = self.frame_reader, Prefetcher(
            self.frame_reader, start=start,
            ahead=int(self.cfg.get('data', {}).get('prefetch', 2)),
            workers=workers)
        try:
            for idx in range(start, self.n_img):
                self.step(idx)
        finally:
            self.join_mesh()
            self.frame_reader.close()
            self.frame_reader = reader
            if self.live is not None:
                self.live.close()
            if self.profile_dir:
                import jax.profiler
                jax.profiler.stop_trace()
        if self.verbose:
            print('INFO: run complete:', self.timers.summary())
