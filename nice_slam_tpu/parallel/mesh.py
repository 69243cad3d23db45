"""Device-mesh construction for multi-chip execution.

The reference's "distribution" is 3 OS processes with shared memory on one
GPU box (SURVEY.md §2.3) — there is nothing to port.  The TPU-native
parallelism axes (SURVEY.md §5.7) are:

  * `rays` — the dominant data-parallel axis.  Every optimization step
    renders a batch of rays whose losses/gradients are sums over rays, so
    sharding rays across chips and `psum`-ing gradients is exact (the
    "sequence parallel" analog: per-ray compositing is local).
  * keyframe and grid-block axes are planned refinements on top (keyframes
    shard trivially with rays; grid-block sharding needs halo exchange and
    only pays once grids outgrow HBM replication — at NICE-SLAM scale the
    four volumes are ~10-50 MB, far below the ~16 GB/chip budget, so
    replicate-and-psum rides ICI bandwidth optimally).
"""

from __future__ import annotations

import jax
import numpy as np


def make_ray_mesh(n_devices: int | None = None,
                  devices: list | None = None) -> jax.sharding.Mesh:
    """A 1-D mesh over `n_devices` with the axis named 'rays'."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return jax.sharding.Mesh(np.asarray(devices), ('rays',))
