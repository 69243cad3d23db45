"""Multi-host distribution tests (SURVEY §5.8).

Two levels:
  * keyframe-sharded mapping on the 8-virtual-device single-process mesh
    must EQUAL the replicated single-chip step (the per-frame PRNG streams
    make the draws identical; only f32 psum order differs);
  * a real 2-process run (subprocesses, gloo CPU collectives,
    jax.distributed.initialize) where each process feeds only its local
    half of the window, checked against the single-process result.
"""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _setup(n_frames=4, perturb=0.0):
    import __graft_entry__ as g
    from nice_slam_tpu.core.cameras import Intrinsics
    from nice_slam_tpu.engine.mapper import (
        MapperConfig, lr_table, stage_schedule)

    model, rcfg, gcfg, grids, params, key = g._tiny_setup()
    if perturb:
        rcfg = rcfg._replace(perturb=perturb)
    intr = Intrinsics(H=24, W=32, fx=16.0, fy=16.0, cx=15.5, cy=11.5)
    stage_lr = tuple((s, (0.005, 0.001, 0.1, 0.005, 0.005))
                     for s in ('coarse', 'middle', 'fine', 'color'))
    mcfg = MapperConfig(pixels=64, iters=6, stage_lr=stage_lr, ba=True,
                        fix_fine=False, fix_color=False)
    opt_dec = {'fine': params['fine'], 'color': params['color']}
    frozen = {k: v for k, v in params.items() if k not in opt_dec}
    rng = np.random.default_rng(0)
    cams = jnp.asarray([[1.0, 0, 0, 0, 0.05 * i, 0, 0]
                        for i in range(n_frames)])
    opt_params = {'cams': cams, 'grids': grids, 'dec': opt_dec}
    colors = jnp.asarray(rng.random((n_frames, 24, 32, 3)), jnp.float32)
    depths = jnp.asarray(0.5 + rng.random((n_frames, 24, 32)) * 0.5,
                         jnp.float32)
    lr_tab = jnp.asarray(lr_table(mcfg, mcfg.iters, 1.0, True, True))
    stage_idx = jnp.asarray(stage_schedule(mcfg, mcfg.iters, True))
    cam_mask = jnp.ones((n_frames,)).at[0].set(0.0)
    return (model, rcfg, mcfg, intr, opt_params, frozen, colors, depths,
            lr_tab, stage_idx, cam_mask, key)


@pytest.mark.parametrize('perturb', [0.0, 1.0])
def test_kf_sharded_matches_replicated(perturb):
    """Keyframe-sharded mapping (4 frames over 4 devices) must reproduce
    the replicated step's values: identical pixel draws per frame, psum
    changes only the f32 summation order.  perturb=1.0 exercises the
    per-ray stratified-jitter key streams (the draws must not depend on
    how the batch is sharded)."""
    from nice_slam_tpu.engine.mapper import make_map_step
    from nice_slam_tpu.parallel.distributed import (
        kf_mesh, make_kf_sharded_map_step, window_to_global)

    (model, rcfg, mcfg, intr, opt_params, frozen, colors, depths,
     lr_tab, stage_idx, cam_mask, key) = _setup(4, perturb=perturb)

    single = make_map_step(model=model, rcfg=rcfg, mcfg=mcfg, intr=intr,
                           n_frames=4, n_iters=mcfg.iters, pix_per_frame=16)
    mesh = kf_mesh(jax.devices()[:4])
    sharded = make_kf_sharded_map_step(
        mesh=mesh, model=model, rcfg=rcfg, mcfg=mcfg, intr=intr,
        n_frames=4, n_iters=mcfg.iters, pix_per_frame=16)

    out_s, _, loss_s = single(opt_params, frozen, None, lr_tab, stage_idx,
                              cam_mask, colors, depths, key)
    c_g, d_g = window_to_global(mesh, np.asarray(colors), np.asarray(depths))
    out_m, _, loss_m = sharded(opt_params, frozen, None, lr_tab, stage_idx,
                               cam_mask, c_g, d_g, key)

    np.testing.assert_allclose(np.asarray(loss_m), np.asarray(loss_s),
                               rtol=2e-4)
    np.testing.assert_allclose(np.asarray(out_m['cams']),
                               np.asarray(out_s['cams']), atol=1e-5)
    for name in out_s['grids']:
        got = np.asarray(out_m['grids'][name])
        want = np.asarray(out_s['grids'][name])
        # psum changes f32 summation order; a voxel whose per-frame grad
        # contributions nearly cancel can flip Adam's update sign, so a
        # handful of cells may differ by ~lr*iters.  Everything else must
        # match tightly.
        frac = np.mean(np.abs(got - want) < 1e-5)
        assert frac > 0.999, (name, frac)


@pytest.mark.parametrize('perturb', [0.0, 1.0])
def test_kf_sharded_imap_matches_replicated(perturb):
    """iMAP mode under keyframe sharding: density rendering, importance
    resampling and the free-space regulation (whose draws are per-frame
    keyed) must also reproduce the replicated step.  perturb=1.0 makes
    the importance u's stochastic (det=False) — covered by the per-ray
    key streams."""
    import jax.numpy as jnp
    from nice_slam_tpu.core.cameras import Intrinsics
    from nice_slam_tpu.engine.mapper import (
        MapperConfig, lr_table, make_map_step, stage_schedule)
    from nice_slam_tpu.models.decoders import (
        DecoderConfig, init_imap_decoder)
    from nice_slam_tpu.parallel.distributed import (
        kf_mesh, make_kf_sharded_map_step, window_to_global)
    from nice_slam_tpu.render.renderer import RenderConfig, SceneModel

    dcfg = DecoderConfig(pos_embedding_method='nerf', imap_hidden=32,
                         imap_blocks=2)
    bound = jnp.asarray([[-2.0, 2.0], [-2.0, 2.0], [-2.0, 2.0]])
    model = SceneModel(kind='imap', decoder=dcfg, bound=bound)
    rcfg = RenderConfig(n_samples=8, n_surface=0, n_importance=4,
                        occupancy=False, perturb=perturb)
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

    single = make_map_step(model=model, rcfg=rcfg, mcfg=mcfg, intr=intr,
                           n_frames=4, n_iters=4, pix_per_frame=8)
    mesh = kf_mesh(jax.devices()[:4])
    sharded = make_kf_sharded_map_step(
        mesh=mesh, model=model, rcfg=rcfg, mcfg=mcfg, intr=intr,
        n_frames=4, n_iters=4, pix_per_frame=8)
    out_s, _, loss_s = single(opt_params, {}, None, lr_tab, stage_idx,
                              cam_mask, colors, depths, key)
    c_g, d_g = window_to_global(mesh, np.asarray(colors),
                                np.asarray(depths))
    out_m, _, loss_m = sharded(opt_params, {}, None, lr_tab, stage_idx,
                               cam_mask, c_g, d_g, key)
    np.testing.assert_allclose(np.asarray(loss_m), np.asarray(loss_s),
                               rtol=2e-4)
    np.testing.assert_allclose(np.asarray(out_m['cams']),
                               np.asarray(out_s['cams']), atol=1e-5)


@pytest.mark.parametrize('mode,n_dev', [('kf', 4), ('rays', 4)])
def test_engine_with_sharded_mapping(mode, n_dev, tmp_path):
    """Orchestrator integration: a full SLAM run with `parallel.map`
    sharding the mapping step over the virtual mesh must track within the
    single-device engine-test bounds."""
    from tests.util import make_test_cfg
    from nice_slam_tpu.engine.slam import SlamSystem

    cfg = make_test_cfg(n_frames=5)
    cfg['parallel'] = {'map': mode, 'devices': n_dev}
    slam = SlamSystem(cfg, nice=True, output=str(tmp_path))
    assert slam.par_mesh is not None and slam.par_mesh.devices.size == n_dev
    slam.run()
    assert slam.timers.frames_tracked == 5
    t_err = np.linalg.norm(
        slam.estimate_c2w[:, :3, 3] - slam.gt_c2w[:, :3, 3], axis=-1)
    # the 5-frame run ends on a just-tracked, not-yet-mapped frame, so the
    # last entry carries the largest error; 3 cm bounds both modes
    assert np.max(t_err) < 0.03, (mode, t_err)


_CHILD = r"""
import json, os, sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
sys.path.insert(0, {repo!r}); sys.path.insert(0, os.path.join({repo!r}, 'tests'))
from nice_slam_tpu.parallel import distributed as D
D.initialize(coordinator_address=f'localhost:{{port}}', num_processes=nproc,
             process_id=pid, cpu_simulation=True, local_device_count=2)
import jax, jax.numpy as jnp, numpy as np
from test_distributed import _setup
(model, rcfg, mcfg, intr, opt_params, frozen, colors, depths,
 lr_tab, stage_idx, cam_mask, key) = _setup(4)
mesh = D.kf_mesh()
assert mesh.devices.size == 4 and jax.process_count() == 2
step = D.make_kf_sharded_map_step(
    mesh=mesh, model=model, rcfg=rcfg, mcfg=mcfg, intr=intr,
    n_frames=4, n_iters=mcfg.iters, pix_per_frame=16)
# each process feeds ONLY its half of the window (2 frames)
lo, hi = pid * 2, pid * 2 + 2
c_g, d_g = D.window_to_global(mesh, np.asarray(colors[lo:hi]),
                              np.asarray(depths[lo:hi]))
out, _, losses = step(opt_params, frozen, None, lr_tab, stage_idx,
                      cam_mask, c_g, d_g, key)
res = dict(losses=np.asarray(losses).tolist(),
           cams=np.asarray(out['cams']).tolist(),
           mid=float(jnp.sum(jnp.abs(out['grids']['middle']))))
print('RESULT' + str(pid) + json.dumps(res), flush=True)
"""


_CHILD_E2E = r"""
import json, os, sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
out = sys.argv[4]
sys.path.insert(0, {repo!r}); sys.path.insert(0, os.path.join({repo!r}, 'tests'))
# the run.py bring-up path: NSTPU_* env -> initialize_from_env()
os.environ['NSTPU_COORDINATOR'] = f'localhost:{{port}}'
os.environ['NSTPU_NUM_PROCESSES'] = str(nproc)
os.environ['NSTPU_PROCESS_ID'] = str(pid)
os.environ['NSTPU_CPU_SIM'] = '1'
os.environ['NSTPU_LOCAL_DEVICES'] = '2'
from nice_slam_tpu.parallel.distributed import initialize_from_env
assert initialize_from_env()
import jax
assert jax.process_count() == nproc and len(jax.devices()) == 4
import numpy as np
from util import make_test_cfg
from nice_slam_tpu.engine.slam import SlamSystem
cfg = make_test_cfg(n_frames=5)
cfg['parallel'] = {{'map': 'kf'}}
slam = SlamSystem(cfg, nice=True, output=out)
assert slam.par_mesh is not None and slam.par_mesh.devices.size == 4
slam.run()
res = dict(poses=np.asarray(slam.estimate_c2w).tolist(),
           gt=np.asarray(slam.gt_c2w).tolist(),
           tracked=slam.timers.frames_tracked,
           mapped=slam.timers.frames_mapped)
print('RESULT' + str(pid) + json.dumps(res), flush=True)
"""


@pytest.mark.slow
def test_two_process_end_to_end_slam(tmp_path):
    """FULL SlamSystem run under a 2-process runtime (2 x 2 virtual
    devices, gloo, `parallel.map: kf`), brought up through the same
    NSTPU_* env path run.py uses.  Both ranks must produce IDENTICAL pose
    lists (the sharded update is replicated) within the single-process
    engine-test bounds."""
    child = tmp_path / 'child_e2e.py'
    child.write_text(_CHILD_E2E.format(repo=REPO))
    import socket
    with socket.socket() as s:
        s.bind(('localhost', 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env.pop('XLA_FLAGS', None)
    procs = [subprocess.Popen(
        [sys.executable, str(child), str(i), '2', str(port),
         str(tmp_path / f'out{i}')],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=str(tmp_path))
        for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        assert p.returncode == 0, out[-4000:]
        outs.append(out)

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith('RESULT'):
                results[int(line[6])] = json.loads(line[7:])
    assert sorted(results) == [0, 1], outs[0][-2000:]
    for r in results.values():
        assert r['tracked'] == 5 and r['mapped'] >= 2

    # ranks agree exactly — the whole run is replicated state + one
    # sharded step whose psum result is identical on every process
    np.testing.assert_allclose(results[0]['poses'], results[1]['poses'],
                               atol=1e-6)
    # and the trajectory tracks within the single-process bounds
    # (tests/test_distributed.test_engine_with_sharded_mapping)
    est = np.asarray(results[0]['poses'])
    gt = np.asarray(results[0]['gt'])
    t_err = np.linalg.norm(est[:, :3, 3] - gt[:, :3, 3], axis=-1)
    assert np.max(t_err) < 0.03, t_err
    # artifacts: each rank wrote its own final mesh
    for i in range(2):
        assert (tmp_path / f'out{i}' / 'mesh' / 'final_mesh.ply').exists()


@pytest.mark.slow
def test_two_process_kf_sharded_map(tmp_path):
    """Real multi-process run: 2 processes x 2 virtual devices, gloo
    collectives, host-local keyframe feeding.  Both ranks must agree with
    each other and with the single-process replicated step."""
    from nice_slam_tpu.engine.mapper import make_map_step

    child = tmp_path / 'child.py'
    child.write_text(_CHILD.format(repo=REPO))
    # hermetic coordinator port: bind an ephemeral one and release it
    import socket
    with socket.socket() as s:
        s.bind(('localhost', 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env.pop('XLA_FLAGS', None)
    procs = [subprocess.Popen(
        [sys.executable, str(child), str(i), '2', str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=str(tmp_path))
        for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, out[-4000:]
        outs.append(out)

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith('RESULT'):
                results[int(line[6])] = json.loads(line[7:])
    assert sorted(results) == [0, 1], outs[0][-2000:]

    # ranks agree (the update is replicated)
    np.testing.assert_allclose(results[0]['losses'], results[1]['losses'],
                               rtol=1e-5)
    np.testing.assert_allclose(results[0]['cams'], results[1]['cams'],
                               rtol=1e-5)

    # and match the in-process replicated reference
    (model, rcfg, mcfg, intr, opt_params, frozen, colors, depths,
     lr_tab, stage_idx, cam_mask, key) = _setup(4)
    single = make_map_step(model=model, rcfg=rcfg, mcfg=mcfg, intr=intr,
                           n_frames=4, n_iters=mcfg.iters, pix_per_frame=16)
    out_s, _, loss_s = single(opt_params, frozen, None, lr_tab, stage_idx,
                              cam_mask, colors, depths, key)
    np.testing.assert_allclose(results[0]['losses'],
                               np.asarray(loss_s).tolist(), rtol=2e-4)
    np.testing.assert_allclose(results[0]['cams'],
                               np.asarray(out_s['cams']).tolist(), atol=1e-5)


_CHILD_AUTOTUNE = r"""
import json, os, sys, time, types
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
sys.path.insert(0, {repo!r}); sys.path.insert(0, os.path.join({repo!r}, 'tests'))
from nice_slam_tpu.parallel import distributed as D
D.initialize(coordinator_address=f'localhost:{{port}}', num_processes=nproc,
             process_id=pid, cpu_simulation=True, local_device_count=2)
import jax, jax.numpy as jnp
from nice_slam_tpu.engine.slam import SlamSystem

self_like = types.SimpleNamespace(
    _fetch_base_s=None, _dispatch_s=None, verbose=False, autotune_choice={{}})
self_like._fetch = SlamSystem._fetch
self_like._agree_time = SlamSystem._agree_time
self_like._fetch_baseline = types.MethodType(
    SlamSystem._fetch_baseline.__func__
    if hasattr(SlamSystem._fetch_baseline, '__func__')
    else SlamSystem._fetch_baseline, self_like)
self_like._autotune = types.MethodType(
    SlamSystem._autotune.__func__
    if hasattr(SlamSystem._autotune, '__func__')
    else SlamSystem._autotune, self_like)

def build(s):
    jfn = jax.jit(lambda x: x + 1.0 + s * 0.0)
    def fn(x):
        # rank 1's salt-0 "binary" is slow: without the rank-synchronized
        # agreement, rank 0 would KEEP salt 0 while rank 1 re-rolls
        if s == 0 and pid == 1:
            time.sleep(0.05)
        return jfn(x)
    return fn

x = jnp.zeros((8,))
fn = self_like._autotune(build, (x,), threshold_s=0.02, candidates=3,
                         tag='probe', reps=3)
salt, t = self_like.autotune_choice['probe']
print('RESULT' + str(pid) + json.dumps({{'salt': salt, 't': t}}), flush=True)
"""


def test_two_process_autotune_agreement(tmp_path):
    """VERDICT r3 #5: the compile-quality probe under a multi-process
    runtime must converge on ONE salt on every rank.  Rank 1's salt-0
    candidate is artificially slow; the allgathered worst-rank verdict
    makes BOTH ranks re-roll to salt 1."""
    child = tmp_path / 'child_autotune.py'
    child.write_text(_CHILD_AUTOTUNE.format(repo=REPO))
    import socket
    with socket.socket() as s:
        s.bind(('localhost', 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env.pop('XLA_FLAGS', None)
    procs = [subprocess.Popen(
        [sys.executable, str(child), str(i), '2', str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=str(tmp_path)) for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, out[-4000:]
        outs.append(out)
    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith('RESULT'):
                results[int(line[6])] = json.loads(line[7:])
    assert sorted(results) == [0, 1], outs[0][-2000:]
    assert results[0]['salt'] == results[1]['salt'] == 1, results


_CHILD_TRACK = r"""
import json, os, sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
sys.path.insert(0, {repo!r}); sys.path.insert(0, os.path.join({repo!r}, 'tests'))
from nice_slam_tpu.parallel import distributed as D
D.initialize(coordinator_address=f'localhost:{{port}}', num_processes=nproc,
             process_id=pid, cpu_simulation=True, local_device_count=2)
import jax, jax.numpy as jnp, numpy as np
assert jax.process_count() == 2 and len(jax.devices()) == 4
import __graft_entry__ as g
from nice_slam_tpu.core.cameras import Intrinsics
from nice_slam_tpu.engine.tracker import TrackerConfig
from nice_slam_tpu.parallel.mesh import make_ray_mesh
from nice_slam_tpu.parallel.sharded import (
    make_sharded_track_frame, replicate_to_mesh)

model, rcfg, gcfg, grids, params, key = g._tiny_setup()
intr = Intrinsics(H=24, W=32, fx=16.0, fy=16.0, cx=15.5, cy=11.5)
tcfg = TrackerConfig(pixels=64, iters=5, cam_lr=0.01, separate_lr=True,
                     ignore_edge_w=2, ignore_edge_h=2, var_floor=1e-4)
mesh = make_ray_mesh(4)
step = make_sharded_track_frame(mesh=mesh, model=model, rcfg=rcfg,
                                tcfg=tcfg, intr=intr)
gt_color = np.full((24, 32, 3), 0.4, np.float32)
yy = np.linspace(0.6, 1.1, 24, dtype=np.float32)[:, None]
gt_depth = np.broadcast_to(yy, (24, 32)).copy()
cam7 = jnp.asarray([1.0, 0.01, 0.0, 0.0, 0.05, 0.0, 0.0])
params_r, grids_r, col_r, dep_r = replicate_to_mesh(
    (params, grids, gt_color, gt_depth), mesh)
best, last, losses = step(params_r, grids_r, col_r, dep_r, cam7, key)
res = dict(best=np.asarray(best).tolist(),
           losses=np.asarray(losses).tolist())
print('RESULT' + str(pid) + json.dumps(res), flush=True)
"""


@pytest.mark.slow
def test_two_process_sharded_tracking(tmp_path):
    """Ray-sharded tracking under a REAL 2-process runtime (2 x 2 virtual
    devices, gloo): both ranks must agree exactly (the update is fully
    replicated), and match the single-process single-device program
    within psum float tolerance (the sharded loss is draw-identical)."""
    from nice_slam_tpu.engine.tracker import TrackerConfig, make_track_frame
    from nice_slam_tpu.core.cameras import Intrinsics
    import __graft_entry__ as g

    child = tmp_path / 'child_track.py'
    child.write_text(_CHILD_TRACK.format(repo=REPO))
    import socket
    with socket.socket() as s:
        s.bind(('localhost', 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env.pop('XLA_FLAGS', None)
    procs = [subprocess.Popen(
        [sys.executable, str(child), str(i), '2', str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=str(tmp_path))
        for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, out[-4000:]
        outs.append(out)
    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith('RESULT'):
                results[int(line[6])] = json.loads(line[7:])
    assert sorted(results) == [0, 1], outs[0][-2000:]
    np.testing.assert_allclose(results[0]['best'], results[1]['best'],
                               atol=1e-6)
    np.testing.assert_allclose(results[0]['losses'], results[1]['losses'],
                               rtol=1e-6)

    # single-process single-device reference (identical inputs)
    model, rcfg, gcfg, grids, params, key = g._tiny_setup()
    intr = Intrinsics(H=24, W=32, fx=16.0, fy=16.0, cx=15.5, cy=11.5)
    tcfg = TrackerConfig(pixels=64, iters=5, cam_lr=0.01, separate_lr=True,
                         ignore_edge_w=2, ignore_edge_h=2, var_floor=1e-4)
    single = make_track_frame(model=model, rcfg=rcfg, tcfg=tcfg, intr=intr)
    gt_color = jnp.full((24, 32, 3), 0.4)
    yy = jnp.linspace(0.6, 1.1, 24)[:, None]
    gt_depth = jnp.broadcast_to(yy, (24, 32))
    cam7 = jnp.asarray([1.0, 0.01, 0.0, 0.0, 0.05, 0.0, 0.0])
    best_s, _, loss_s = single(params, grids, gt_color, gt_depth, cam7, key)
    np.testing.assert_allclose(results[0]['best'], np.asarray(best_s),
                               atol=5e-5)
    np.testing.assert_allclose(results[0]['losses'], np.asarray(loss_s),
                               rtol=2e-4)
