"""CLI entry coverage: `python run.py <config>` end to end in a
subprocess — the exact user invocation, through SlamSystem.run() (so the
Prefetcher, live dashboard and final mesh join are on the executed path),
on a disk-resident Replica-format fixture sequence."""

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, 'tools'))


def test_run_py_cli_end_to_end(tmp_path):
    import yaml
    from make_fixture_dataset import make_frames, write_config, write_dataset

    h, w = 48, 64
    fx = fy = 0.5 * w
    cx, cy = 0.5 * w - 0.5, 0.5 * h - 0.5
    frames = make_frames(6, h, w, fx, fy, cx, cy)
    folder = str(tmp_path / 'seq')
    os.makedirs(folder)
    write_dataset('replica', folder, frames, h, w, fx, fy, cx, cy)
    cfg_path = write_config('replica', folder, frames, h, w, fx, fy, cx, cy)

    # shrink budgets for CPU CI (the fixture config carries full ones)
    with open(cfg_path) as f:
        cfg = yaml.safe_load(f)
    cfg['tracking'].update(pixels=120, iters=10)
    cfg['mapping'].update(pixels=240, iters=20, iters_first=200,
                          every_frame=3, keyframe_every=3,
                          mapping_window_size=3, lr_first_factor=2,
                          color_refine=False)
    cfg['rendering'].update(N_samples=12, N_surface=6)
    cfg['meshing']['resolution'] = 48
    cfg['verbose'] = False
    cfg['data']['prefetch_workers'] = 2
    with open(cfg_path, 'w') as f:
        yaml.safe_dump(cfg, f)

    out_dir = str(tmp_path / 'out')
    env = dict(os.environ)
    env.pop('XLA_FLAGS', None)
    env['JAX_PLATFORMS'] = 'cpu'
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, 'run.py'), cfg_path,
         '--output', out_dir, '--live'],
        capture_output=True, text=True, timeout=900, cwd=REPO, env=env)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    assert 'INFO: done.' in proc.stdout

    # run() artifacts: final mesh (mesh join ran), checkpoint, metrics log,
    # live dashboard reaching the last frame
    assert os.path.isfile(os.path.join(out_dir, 'mesh', 'final_mesh.ply'))
    assert os.path.isfile(os.path.join(out_dir, 'ckpts', '00005.ckpt'))
    metrics = [json.loads(l) for l in
               open(os.path.join(out_dir, 'metrics.jsonl'))]
    assert metrics[-1]['frame'] == 5
    assert all(m['pose_err_vs_gt'] < 0.05 for m in metrics), metrics
    status = json.load(open(os.path.join(out_dir, 'live', 'status.json')))
    assert status['frame'] == 5
