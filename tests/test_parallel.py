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
