"""Engine integration tests on the synthetic box scene (CPU).

Milestones 2-4 of SURVEY.md §7.2: first-frame map fitting, tracking pose
recovery, and a short end-to-end strict-schedule run.
"""

import numpy as np
import pytest

from tests.util import make_test_cfg


@pytest.fixture(scope='module')
def slam_after_first_map():
    from nice_slam_tpu.engine.slam import SlamSystem
    cfg = make_test_cfg()
    slam = SlamSystem(cfg, nice=True, output='/tmp/nstpu_test_first')
    slam.step(0)
    return slam


def test_first_frame_mapping_reduces_depth_error(slam_after_first_map):
    """After iters_first mapping the rendered depth should approach the
    sensor depth of frame 0 (the reference's 1500-iter bootstrap,
    Mapper.py:729-732)."""
    import jax.numpy as jnp
    from nice_slam_tpu.core.cameras import rays_from_uv
    from nice_slam_tpu.render.renderer import render_rays

    slam = slam_after_first_map
    _, color, depth, c2w = slam.frame_reader[0]
    rng = np.random.default_rng(0)
    ii = rng.integers(5, slam.intr.W - 5, 200).astype(np.float32)
    jj = rng.integers(5, slam.intr.H - 5, 200).astype(np.float32)
    o, d = rays_from_uv(jnp.asarray(ii), jnp.asarray(jj),
                        jnp.asarray(c2w), slam.intr)
    dgt = depth[jj.astype(int), ii.astype(int)]
    dep, var, col, _ = render_rays(
        slam.full_dec_params(), slam.grids, o, d, stage='color',
        model=slam.model, rcfg=slam.rcfg, gt_depth=jnp.asarray(dgt))
    err = np.abs(np.asarray(dep) - dgt)
    assert np.median(err) < 0.08, f'median depth err {np.median(err):.3f}'


def test_tracking_recovers_perturbed_pose(slam_after_first_map):
    """Render-based tracking should pull a perturbed pose back toward the
    truth on the mapped frame (milestone 3)."""
    import jax.numpy as jnp
    slam = slam_after_first_map
    _, color, depth, c2w = slam.frame_reader[0]

    perturbed = c2w.copy()
    perturbed[:3, 3] += np.array([0.04, -0.03, 0.02], dtype=np.float32)
    ang = 0.02
    rot = np.array([[np.cos(ang), -np.sin(ang), 0],
                    [np.sin(ang), np.cos(ang), 0],
                    [0, 0, 1]], dtype=np.float32)
    perturbed[:3, :3] = perturbed[:3, :3] @ rot

    from nice_slam_tpu.engine.tracker import make_track_frame
    import jax
    track_fn = make_track_frame(model=slam.model, rcfg=slam.rcfg,
                                tcfg=slam.tcfg._replace(iters=30),
                                intr=slam.intr)
    cam7 = slam._cam7(perturbed)
    best_cam7, _, losses = track_fn(
        slam.full_dec_params(), slam.grids,
        jnp.asarray(color), jnp.asarray(depth), cam7, jax.random.PRNGKey(1))

    from nice_slam_tpu.core.cameras import c2w_from_tensor_4x4
    got = np.asarray(c2w_from_tensor_4x4(best_cam7))
    t_err0 = np.linalg.norm(perturbed[:3, 3] - c2w[:3, 3])
    t_err = np.linalg.norm(got[:3, 3] - c2w[:3, 3])
    assert t_err < 0.6 * t_err0, (t_err0, t_err)
    assert float(losses[-1]) < float(losses[0])


def test_short_end_to_end_run():
    """Strict-schedule run over a few frames: poses stay close to GT on the
    easy synthetic scene (the Demo-equivalent smoke test)."""
    from nice_slam_tpu.engine.slam import SlamSystem
    cfg = make_test_cfg(n_frames=9)
    slam = SlamSystem(cfg, nice=True, output='/tmp/nstpu_test_e2e')
    slam.run()
    # all frames tracked
    assert slam.timers.frames_tracked == 9
    # mapped at 0, 4, 8 (every_frame=4 + final frame)
    assert slam.timers.frames_mapped == 3
    assert len(slam.keyframes) >= 2  # kf at 0, 4(+7 = n-2)
    t_err = np.linalg.norm(
        slam.estimate_c2w[:, :3, 3] - slam.gt_c2w[:, :3, 3], axis=-1)
    assert np.max(t_err) < 0.02, t_err
    assert np.mean(t_err) < 0.01, t_err


def test_checkpoint_roundtrip(tmp_path):
    from nice_slam_tpu.engine.slam import SlamSystem
    from nice_slam_tpu.utils.ckpt import load_checkpoint, save_checkpoint
    cfg = make_test_cfg(n_frames=5)
    slam = SlamSystem(cfg, nice=True, output=str(tmp_path))
    slam.step(0)
    path = str(tmp_path / 'state.ckpt')
    save_checkpoint(path, slam.checkpoint_state())

    slam2 = SlamSystem(cfg, nice=True, output=str(tmp_path / 'resume'))
    nxt = slam2.restore(load_checkpoint(path))
    assert nxt == 1
    assert len(slam2.keyframes) == len(slam.keyframes)
    np.testing.assert_allclose(
        np.asarray(slam2.grids['middle']), np.asarray(slam.grids['middle']),
        atol=1e-6)
    # the restored system must actually CONTINUE: track+map the remaining
    # frames with bounded error (the reference cannot resume at all)
    slam2.run(start=nxt)
    assert slam2.timers.frames_tracked == 4   # frames 1..4
    t_err = np.linalg.norm(
        slam2.estimate_c2w[:, :3, 3] - slam2.gt_c2w[:, :3, 3], axis=-1)
    assert np.max(t_err) < 0.02, t_err


def test_resume_bit_faithful(tmp_path):
    """A resumed run must be bit-identical to never having stopped: the
    checkpoint carries the PRNG streams (JAX key + numpy bit generator) and
    all schedule counters, and with compress_images=False the keyframe
    imagery is exact (resume contract, utils/ckpt.py)."""
    from nice_slam_tpu.engine.slam import SlamSystem
    from nice_slam_tpu.utils.ckpt import load_checkpoint, save_checkpoint
    cfg = make_test_cfg(n_frames=9)

    ref = SlamSystem(cfg, nice=True, output=str(tmp_path / 'a'))
    ref.run()

    part = SlamSystem(cfg, nice=True, output=str(tmp_path / 'b'))
    for i in range(5):
        part.step(i)
    path = str(tmp_path / 'state.ckpt')
    save_checkpoint(path, part.checkpoint_state(), compress_images=False)

    res = SlamSystem(cfg, nice=True, output=str(tmp_path / 'c'))
    nxt = res.restore(load_checkpoint(path))
    assert nxt == 5
    res.run(start=nxt)

    assert np.array_equal(res.estimate_c2w, ref.estimate_c2w), (
        np.abs(res.estimate_c2w - ref.estimate_c2w).max())
    for name in ref.grids:
        assert np.array_equal(np.asarray(res.grids[name]),
                              np.asarray(ref.grids[name])), name
    # and the PRNG streams ended in the same state
    assert np.array_equal(np.asarray(res.key), np.asarray(ref.key))
    assert res.np_rng.bit_generator.state == ref.np_rng.bit_generator.state


def test_imap_end_to_end_run():
    """iMAP* mode (single MLP, density rendering, N_importance resampling,
    StepLR decay, free-space regulation) over a few frames."""
    from nice_slam_tpu.engine.slam import SlamSystem
    cfg = make_test_cfg(n_frames=5, nice=False, coarse=False)
    cfg['rendering']['N_importance'] = 4
    cfg['rendering']['N_surface'] = 8
    cfg['mapping']['iters_first'] = 150
    cfg['mapping']['iters'] = 30
    cfg['tracking']['iters'] = 15
    slam = SlamSystem(cfg, nice=False, output='/tmp/nstpu_test_imap')
    slam.run()
    assert slam.timers.frames_tracked == 5
    t_err = np.linalg.norm(
        slam.estimate_c2w[:, :3, 3] - slam.gt_c2w[:, :3, 3], axis=-1)
    assert np.max(t_err) < 0.08, t_err
    import os
    assert os.path.exists('/tmp/nstpu_test_imap/metrics.jsonl')


def test_live_viewer_during_run(tmp_path):
    """`visualization.live` produces an updating dashboard while the run
    executes: trajectory plot, mesh render, status.json reaching the last
    frame, and (with live_port: 0) a working HTTP endpoint."""
    import json
    import urllib.request

    from tests.util import make_test_cfg
    from nice_slam_tpu.engine.slam import SlamSystem

    cfg = make_test_cfg(n_frames=5)
    cfg['mapping']['mesh_freq'] = 4          # a mesh lands mid-run
    cfg['visualization'] = {'live': True, 'live_freq': 2, 'live_port': 0}
    slam = SlamSystem(cfg, nice=True, output=str(tmp_path))
    port = slam.live.port
    assert port
    slam.run()

    live = tmp_path / 'live'
    assert (live / 'index.html').exists()
    assert (live / 'traj.png').exists()
    assert (live / 'mesh.png').exists()       # rendered from the run's mesh
    status = json.loads((live / 'status.json').read_text())
    assert status['frame'] == 4 and status['n_img'] == 5
    assert status['pose_err_vs_gt_m'] < 0.03
    # server was live during the run; closed in run()'s finally
    slam.live.close()


def test_live_viewer_http_serves(tmp_path):
    """The HTTP endpoint serves the dashboard files."""
    import json
    import urllib.request

    import numpy as np
    from nice_slam_tpu.core.cameras import Intrinsics
    from nice_slam_tpu.utils.live import LiveViewer

    intr = Intrinsics(H=24, W=32, fx=16.0, fy=16.0, cx=15.5, cy=11.5)
    lv = LiveViewer(str(tmp_path), intr, freq=1, port=0)
    try:
        est = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
        gt = est.copy()
        est[2, :3, 3] += 0.01
        assert lv.update(2, 3, est, gt)
        with urllib.request.urlopen(
                f'http://localhost:{lv.port}/status.json', timeout=10) as r:
            status = json.loads(r.read())
        assert abs(status['pose_err_vs_gt_m'] - 0.01 * 3 ** 0.5) < 1e-4
        with urllib.request.urlopen(
                f'http://localhost:{lv.port}/index.html', timeout=10) as r:
            assert b'traj.png' in r.read()
    finally:
        lv.close()


def test_chunked_map_pass_matches_unchunked():
    """max_rays_per_pass chunks the render into frame groups with
    gradient accumulation; draws, far-clamp max and loss sums are
    window-global, so results must match the unchunked step to fp
    tolerance (both NICE and iMAP paths)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tests.test_distributed import _setup
    from nice_slam_tpu.engine.mapper import make_map_step

    (model, rcfg, mcfg, intr, opt_params, frozen, colors, depths,
     lr_tab, stage_idx, cam_mask, key) = _setup(4, perturb=1.0)

    ref_step = make_map_step(model=model, rcfg=rcfg, mcfg=mcfg, intr=intr,
                             n_frames=4, n_iters=mcfg.iters,
                             pix_per_frame=16)
    chunked = make_map_step(model=model, rcfg=rcfg,
                            mcfg=mcfg._replace(max_rays_per_pass=16),
                            intr=intr, n_frames=4, n_iters=mcfg.iters,
                            pix_per_frame=16)
    out_r, _, loss_r = ref_step(opt_params, frozen, None, lr_tab,
                                stage_idx, cam_mask, colors, depths, key)
    out_c, _, loss_c = chunked(opt_params, frozen, None, lr_tab,
                               stage_idx, cam_mask, colors, depths, key)
    np.testing.assert_allclose(np.asarray(loss_c), np.asarray(loss_r),
                               rtol=2e-4)
    np.testing.assert_allclose(np.asarray(out_c['cams']),
                               np.asarray(out_r['cams']), atol=1e-5)
    for name in out_r['grids']:
        got = np.asarray(out_c['grids'][name])
        want = np.asarray(out_r['grids'][name])
        # group accumulation reorders the f32 grid-gradient folds; voxels
        # whose per-group contributions nearly cancel can flip Adam's
        # update sign (same phenomenon as the kf-sharded psum,
        # tests/test_distributed.py) — all but a handful must match
        frac = np.mean(np.abs(got - want) < 1e-5)
        assert frac > 0.995, (name, frac)


def test_chunked_map_pass_matches_unchunked_imap():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from nice_slam_tpu.core.cameras import Intrinsics
    from nice_slam_tpu.engine.mapper import (
        MapperConfig, lr_table, make_map_step, stage_schedule)
    from nice_slam_tpu.models.decoders import DecoderConfig, init_imap_decoder
    from nice_slam_tpu.render.renderer import RenderConfig, SceneModel

    dcfg = DecoderConfig(pos_embedding_method='nerf', imap_hidden=32,
                         imap_blocks=2)
    bound = jnp.asarray([[-2.0, 2.0], [-2.0, 2.0], [-2.0, 2.0]])
    model = SceneModel(kind='imap', decoder=dcfg, bound=bound)
    rcfg = RenderConfig(n_samples=8, n_surface=0, n_importance=4,
                        occupancy=False, perturb=1.0)
    mcfg = MapperConfig(pixels=32, iters=4, ba=True, window_size=4)
    intr = Intrinsics(H=24, W=32, fx=16.0, fy=16.0, cx=15.5, cy=11.5)
    key = jax.random.PRNGKey(3)
    params = init_imap_decoder(key, dcfg)
    rng = np.random.default_rng(1)
    cams = jnp.asarray([[1.0, 0, 0, 0, 0.05 * i, 0, 0] for i in range(4)])
    opt_params = {'cams': cams, 'grids': {}, 'dec': {'imap': params}}
    colors = jnp.asarray(rng.random((4, 24, 32, 3)), jnp.float32)
    depths = jnp.asarray(0.5 + rng.random((4, 24, 32)), jnp.float32)
    lr_tab = jnp.asarray(lr_table(mcfg, 4, 1.0, False, True))
    stage_idx = jnp.asarray(stage_schedule(mcfg, 4, False))
    cam_mask = jnp.ones((4,)).at[0].set(0.0)

    kw = dict(model=model, rcfg=rcfg, intr=intr, n_frames=4, n_iters=4,
              pix_per_frame=8)
    ref_step = make_map_step(mcfg=mcfg, **kw)
    chunked = make_map_step(mcfg=mcfg._replace(max_rays_per_pass=8), **kw)
    out_r, _, loss_r = ref_step(opt_params, {}, None, lr_tab, stage_idx,
                                cam_mask, colors, depths, key)
    out_c, _, loss_c = chunked(opt_params, {}, None, lr_tab, stage_idx,
                               cam_mask, colors, depths, key)
    np.testing.assert_allclose(np.asarray(loss_c), np.asarray(loss_r),
                               rtol=2e-4)
    # group accumulation reorders f32 pose-grad sums; Adam's
    # grad/(sqrt(v)+eps) normalization amplifies the last-ulp difference
    # (measured 2.6e-5 after 4 iters on this fixture)
    np.testing.assert_allclose(np.asarray(out_c['cams']),
                               np.asarray(out_r['cams']), atol=1e-4)


def test_max_rays_per_pass_below_frame_granularity_raises():
    """ADVICE r3: max_rays_per_pass below the per-frame ray count used to
    spin forever in the group-count search (while n_frames % groups);
    it must raise a clear error instead (frame granularity is the finest
    split the grouping supports)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest
    from tests.test_distributed import _setup
    from nice_slam_tpu.engine.mapper import make_map_step

    (model, rcfg, mcfg, intr, opt_params, frozen, colors, depths,
     lr_tab, stage_idx, cam_mask, key) = _setup(4, perturb=1.0)

    step = make_map_step(model=model, rcfg=rcfg,
                         mcfg=mcfg._replace(max_rays_per_pass=8),
                         intr=intr, n_frames=4, n_iters=mcfg.iters,
                         pix_per_frame=16)   # 16 rays/frame > 8 cap
    with pytest.raises(ValueError, match='max_rays_per_pass'):
        step(opt_params, frozen, None, lr_tab, stage_idx, cam_mask,
             colors, depths, key)


def test_free_mode_fenced_on_one_device(monkeypatch, tmp_path):
    """On a single local device `sync_method: free` must alias to 'loose'
    with a warning (measured strictly worse at equal accuracy on one chip,
    BASELINE.md round-4 sync rows); `sync_force_free: true` keeps it."""
    import jax
    from nice_slam_tpu.engine import slam as slam_mod

    one_dev = jax.local_devices()[:1]
    monkeypatch.setattr(slam_mod.jax, 'local_devices', lambda: one_dev)

    cfg = make_test_cfg(n_frames=3)
    cfg['sync_method'] = 'free'
    with pytest.warns(UserWarning, match="slower than 'loose'"):
        s = slam_mod.SlamSystem(cfg, nice=True, output=str(tmp_path / 'a'))
    assert s.sync_method == 'loose'

    cfg2 = make_test_cfg(n_frames=3)
    cfg2['sync_method'] = 'free'
    cfg2['sync_force_free'] = True
    s2 = slam_mod.SlamSystem(cfg2, nice=True, output=str(tmp_path / 'b'))
    assert s2.sync_method == 'free'
