"""Multi-host distribution (SURVEY §5.8, §2.3).

The reference's "distributed runtime" is 3 OS processes with POSIX shared
memory on one box (/root/reference/src/NICE_SLAM.py:88-134).  The TPU-native
replacement spans HOSTS: `jax.distributed.initialize` starts the cross-
process runtime, a named mesh spans every process's devices, and the
mapping window's keyframes are sharded across hosts — each host feeds ONLY
its local keyframe images to the device mesh (`jax.make_array_from_
process_local_data`), renders rays from them, and grid/pose gradients are
`psum`-ed over the `kf` axis (ICI within a slice, DCN across slices; XLA
picks the transport from the mesh).

Three pieces:
  * `initialize(...)` — process bring-up (coordinator + rank), with a CPU
    simulation path (gloo collectives + virtual host devices) used by the
    multiprocess tests, so the multi-host program is exercised in CI
    without a pod.
  * `kf_mesh()` — 1-D global device mesh with axis 'kf'.
  * `make_kf_sharded_map_step(...)` — the mapping step with the window's
    frames split across the mesh.  Per-frame PRNG streams make its draws
    bit-identical to the replicated single-chip step (the psum only
    changes f32 summation order), so exactness is testable.

Scale analysis (why keyframes are the cross-host axis): a mapping window is
4-10 frames x ~10 MB of RGB-D — the only state whose footprint grows with
window size, and rays never reference frames outside their own shard, so
the only cross-host traffic is one gradient all-reduce per iteration
(grids 10-50 MB replicated; see parallel/mesh.py for why replicate+psum
beats grid sharding at this scale).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nice_slam_tpu.core.cameras import Intrinsics
from nice_slam_tpu.engine.mapper import (
    MapperConfig, build_stage_losses, scan_map_iters)
from nice_slam_tpu.render.renderer import RenderConfig, SceneModel


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               *, cpu_simulation: bool = False,
               local_device_count: int | None = None) -> None:
    """Bring up the multi-process JAX runtime.

    On a real pod slice the three arguments usually come from the cluster
    environment and may all be None (jax.distributed auto-detects).  With
    `cpu_simulation=True` the process joins a gloo-backed CPU "pod" of
    `local_device_count` virtual devices per process — the path the
    multiprocess CI tests use (tests/test_distributed.py).
    """
    if cpu_simulation:
        if local_device_count:
            flags = os.environ.get('XLA_FLAGS', '')
            os.environ['XLA_FLAGS'] = (
                f'{flags} --xla_force_host_platform_device_count='
                f'{local_device_count}')
        jax.config.update('jax_platforms', 'cpu')
        jax.config.update('jax_cpu_collectives_implementation', 'gloo')
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def initialize_from_env() -> bool:
    """Initialize from NSTPU_* environment variables if present (returns
    whether multi-process mode was entered).  Used by run.py so a pod
    launcher only has to export the coordinator and rank."""
    coord = os.environ.get('NSTPU_COORDINATOR')
    if not coord:
        return False
    initialize(
        coordinator_address=coord,
        num_processes=int(os.environ['NSTPU_NUM_PROCESSES']),
        process_id=int(os.environ['NSTPU_PROCESS_ID']),
        cpu_simulation=bool(int(os.environ.get('NSTPU_CPU_SIM', '0'))),
        local_device_count=int(os.environ.get('NSTPU_LOCAL_DEVICES', '0'))
        or None)
    return True


def kf_mesh(devices: list | None = None) -> Mesh:
    """1-D mesh over all GLOBAL devices (every process's), axis 'kf'."""
    return Mesh(np.asarray(devices if devices is not None
                           else jax.devices()), ('kf',))


def window_to_global(mesh: Mesh, colors_local: np.ndarray,
                     depths_local: np.ndarray):
    """Assemble the global [F, H, W, ...] window arrays from each process's
    LOCAL keyframe shard.

    Each process passes only the frames it owns (F_local = F /
    process_count, in rank order); no host ever materializes the full
    window.  Single-process meshes take the plain device_put path.
    """
    c_shard = NamedSharding(mesh, P('kf'))
    d_shard = NamedSharding(mesh, P('kf'))
    if jax.process_count() == 1:
        return (jax.device_put(colors_local, c_shard),
                jax.device_put(depths_local, d_shard))
    return (jax.make_array_from_process_local_data(c_shard, colors_local),
            jax.make_array_from_process_local_data(d_shard, depths_local))


def make_kf_sharded_map_step(*, mesh: Mesh, model: SceneModel,
                             rcfg: RenderConfig, mcfg: MapperConfig,
                             intr: Intrinsics, n_frames: int, n_iters: int,
                             pix_per_frame: int):
    """Keyframe-sharded variant of engine.mapper.make_map_step.

    The window's `n_frames` frames are split across the mesh's devices
    (n_frames % mesh size == 0 — the orchestrator already pads windows by
    cycling real frames).  colors/depths arrive sharded P('kf') on the
    frame axis; everything else is replicated.  Each device renders
    `pix_per_frame` rays from each of its local frames with the SAME
    per-frame PRNG streams as the replicated step (pixel draws, the iMAP
    free-space regulation, and — via per-ray key streams — the
    stratified-sample jitter and importance draws when
    `rendering.perturb > 0`), so the losses/updates match the
    single-chip program bit-for-bit up to f32 psum order.

    Signature matches make_map_step.
    """
    n_dev = mesh.devices.size
    assert n_frames % n_dev == 0, (
        f'window of {n_frames} frames not divisible over {n_dev} devices')
    f_local = n_frames // n_dev
    nice = model.kind == 'nice'

    _, loss_fns = build_stage_losses(
        model=model, rcfg=rcfg, mcfg=mcfg, intr=intr, n_frames=f_local,
        pix_per_frame=pix_per_frame, kf_axis='kf', n_frames_global=n_frames)

    def sharded_grad(loss_fn):
        def local(opt_p, frozen_dec, colors, depths, key):
            loss, grads = jax.value_and_grad(loss_fn)(
                opt_p, frozen_dec, colors, depths, key)
            return jax.lax.psum(loss, 'kf'), jax.lax.psum(grads, 'kf')

        return jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(), P('kf'), P('kf'), P()),
            out_specs=(P(), P()), check_vma=False)

    grad_fns = [sharded_grad(f) for f in loss_fns]

    def map_step(opt_params, frozen_dec, masks, lr_tab, stage_idx, cam_mask,
                 colors, depths, key, opt_state=None):
        return scan_map_iters(grad_fns, nice, n_iters, opt_params,
                              frozen_dec, masks, lr_tab, stage_idx,
                              cam_mask, colors, depths, key, opt_state)

    return jax.jit(map_step)
