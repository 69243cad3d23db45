"""Overlapped (loose/free) scheduling: the tracker renders against a grid
snapshot and consumes mapping updates when they are ready, on a two-device
host pipeline (tracking on device 0, mapping on device 1 — the reference's
tracking.device/mapping.device split, nice_slam.yaml:38,54)."""

import numpy as np
import pytest

from tests.util import make_test_cfg


@pytest.mark.parametrize('sync', ['loose', 'free'])
def test_overlapped_run_tracks_accurately(tmp_path, sync):
    import jax
    from nice_slam_tpu.engine.slam import SlamSystem

    cfg = make_test_cfg(n_frames=10, coarse=False)
    cfg['sync_method'] = sync
    cfg['debug'] = {}   # invariant checks block on device reads
    slam = SlamSystem(cfg, nice=True, output=str(tmp_path))
    # the 8-device CPU mesh exposes >1 device: pipeline split must engage
    assert slam.map_device is not slam.track_device
    slam.run()
    t_err = np.linalg.norm(
        slam.estimate_c2w[:, :3, 3] - slam.gt_c2w[:, :3, 3], axis=-1)
    assert np.isfinite(t_err).all()
    # staler maps than strict, so a looser bound than the strict-mode tests
    assert t_err.max() < 0.05, t_err
    assert slam.timers.frames_tracked == 10


def test_loose_gate_forces_refresh(tmp_path):
    """Every non-final mapping update must be consumed by the tracker
    within the loose window (every_frame + every_frame//2 frames)."""
    from nice_slam_tpu.engine.slam import SlamSystem

    cfg = make_test_cfg(n_frames=12, coarse=False)
    cfg['sync_method'] = 'loose'
    cfg['debug'] = {}
    slam = SlamSystem(cfg, nice=True, output=str(tmp_path))

    seen_before, seen_after = [], []   # (tracked frame, pending-from) pairs
    orig_track = slam.track

    def spying_track(idx, *a, **kw):
        if slam._pending_refresh is not None:
            seen_before.append((idx, slam._pending_refresh[0]))
        r = orig_track(idx, *a, **kw)
        if slam._pending_refresh is not None:
            seen_after.append((idx, slam._pending_refresh[0]))
        return r

    slam.track = spying_track
    slam.run()

    # the async path must actually have been exercised at least once ...
    assert seen_before, 'no mapping update was ever dispatched async'
    # ... and after each track() call no pending update may have outlived
    # the loose window (track consumes it — forced — once the gate passes)
    gate = slam.mcfg.every_frame + slam.mcfg.every_frame // 2
    over = [(i, p) for i, p in seen_after if i - p > gate]
    assert not over, f'pending mapping outlived the loose gate: {over}'
    # nothing dangles at the end except possibly the final frame's mapping
    if slam._pending_refresh is not None:
        assert slam._pending_refresh[0] == 11
