"""Checkpoint save/restore (aux subsystem #4 of SURVEY.md §5).

The reference's Logger (/root/reference/src/utils/Logger.py:21-35) is
write-only: it saves grids/decoders/pose lists every `ckpt_freq` frames but
there is no resume path anywhere, and keyframe images are not saved, so a
true resume is impossible there.  Here checkpoints are symmetric:
`save_checkpoint`/`load_checkpoint` round-trip the full SLAM state including
the keyframe store (images optionally float16-compressed), so a preempted
run restarts from the last mapped frame.

Resume contract: a checkpoint carries the PRNG streams (JAX key + numpy
bit-generator state) and all schedule counters, so a resumed run replays
the exact iteration schedule and random draws of the uninterrupted run.
With `ckpt.compress_images: false` the restore is bit-faithful — the
resumed run's subsequent poses/grids are identical to never having
stopped (tests/test_engine.py::test_resume_bit_faithful).  The default
(true) rounds keyframe imagery through float16 (~1e-3 relative) to halve
checkpoint size; everything else stays exact.
"""

from __future__ import annotations

import os
import pickle
from typing import Any

import jax
import numpy as np


def _to_numpy(tree: Any) -> Any:
    # Only device arrays need conversion; leave host leaves (ints, strings,
    # rng-state dict entries, numpy arrays) untouched for pickle.
    return jax.tree.map(
        lambda x: np.asarray(x) if isinstance(x, jax.Array) else x, tree)


def save_checkpoint(path: str, state: dict, *, compress_images: bool = True
                    ) -> None:
    """Serialize a SLAM state dict (grids, decoder params, pose lists,
    keyframe store, counters) to `path`."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    out = dict(state)
    out = _to_numpy(out)
    if compress_images and 'keyframes' in out:
        for kf in out['keyframes']:
            kf['color'] = kf['color'].astype(np.float16)
            kf['depth'] = kf['depth'].astype(np.float16)
    tmp = path + '.tmp'
    with open(tmp, 'wb') as f:
        pickle.dump(out, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> dict:
    with open(path, 'rb') as f:
        state = pickle.load(f)
    if 'keyframes' in state:
        for kf in state['keyframes']:
            kf['color'] = kf['color'].astype(np.float32)
            kf['depth'] = kf['depth'].astype(np.float32)
    return state


def latest_checkpoint(ckpt_dir: str) -> str | None:
    if not os.path.isdir(ckpt_dir):
        return None
    files = sorted(f for f in os.listdir(ckpt_dir) if f.endswith('.ckpt'))
    return os.path.join(ckpt_dir, files[-1]) if files else None
