"""HEAD-TO-HEAD: our system vs the ACTUAL reference NICE-SLAM system.

VERDICT r3 missing #1: every accuracy claim so far rested on the synthetic
orbit plus component differentials; this runs the reference's real
tracker+mapper(+coarse) torch system (via scripts/ref_system_harness.py,
CPU) and our SlamSystem on the SAME disk-resident Replica-format fixture
sequence at IDENTICAL budgets, seeds aside (the two stacks draw pixels
from different PRNGs; acceptance is distribution-level, SURVEY §7.3).

Both systems load the SAME pretrained decoder weights
(pretrained/coarse.pt + middle_fine.pt — reference-format blobs written by
tools/pretrain_decoders.py; the reference's load_pretrain consumes them
directly, NICE_SLAM.py:210-241).

Variants (budgets from the reference's own configs):
  demo     Demo cam 480x640, loose sync, track 1000px x 30 @ lr 5e-4,
           map 1000px x 10 every 10, iters_first 400
           (configs/Demo/demo.yaml:7-27) — the config whose back-half
           drift BASELINE.md round 3 measured (0.107 m mean with
           pretrained); this tells us whether the reference drifts too.
  replica  Replica cam 680x1200, strict sync, track 200px x 10 @ lr 1e-3,
           map 1000px x 60 every 5, window 5
           (configs/Replica/replica.yaml:4-24) — the full-budget mode our
           500-frame soak holds 2.03 cm ATE on.

Deviations shared by BOTH systems (so comparability holds): the fixture
orbit scene, keyframe_every 5 (reference Replica uses 50; 5 keeps the
keyframe set non-degenerate at short lengths — NOTE the bench_demo soaks
use the shipped Demo config's 50, so their rows are not directly
comparable to these), meshing/vis disabled.  BA defaults ON — the
reference's config tree never overrides `BA: True`
(configs/nice_slam.yaml:60, no per-scene override), so BA-on is its
default operating mode; `--no-ba` reproduces the round-4 BA-off rows
(which were measured with both systems BA-off, internally fair).

Usage:
  python scripts/bench_headtohead.py [demo|replica] [n_frames]
      [--no-ba] [--skip-ref] [--skip-ours] [--iters-first N] [--step S]
      [--kf-every N] [--runs-ref N] [--runs-ours N] [--tag T]

`--kf-every 50 --iters-first 1500` with n_frames >= 300 is the FULL-DEFAULT
variant (the reference Replica config's own keyframe_every 50 /
iters_first 1500, configs/Replica/replica.yaml:22-24) — the other rows
deliberately shrink both so short fixtures keep a non-degenerate keyframe
set.  `--runs-ref/--runs-ours` repeat each side (the reference is unseeded
torch, so repeats are independent draws; ours varies `--seed`), appending
every run to the results JSON so spreads can be quoted per row.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, 'tools'))

CAMS = {
    'demo': dict(h=480, w=640, fx=577.590698, fy=578.729797,
                 cx=318.905426, cy=242.683609),
    'replica': dict(h=680, w=1200, fx=600.0, fy=600.0, cx=599.5, cy=339.5),
}


def build_fixture(variant: str, n_frames: int, root: str,
                  step: float = 0.02) -> str:
    from make_fixture_dataset import make_frames, write_dataset
    cam = CAMS[variant]
    out = os.path.join(root, 'data')
    if os.path.isfile(os.path.join(out, 'traj.txt')):
        return out
    print(f'INFO: rendering {n_frames}-frame fixture at '
          f'{cam["h"]}x{cam["w"]} step {step} ...', flush=True)
    frames = make_frames(n_frames, cam['h'], cam['w'], cam['fx'],
                         cam['fy'], cam['cx'], cam['cy'], step=step)
    write_dataset('replica', out, frames, cam['h'], cam['w'],
                  cam['fx'], cam['fy'], cam['cx'], cam['cy'])
    return out


def build_config(variant: str, n_frames: int, root: str, data_dir: str,
                 ba: bool, iters_first: int | None,
                 kf_every: int = 5) -> str:
    from make_fixture_dataset import BOX, write_config, make_frames  # noqa
    cam = CAMS[variant]
    pad = 0.4
    bound = (np.asarray(BOX) + np.array([-pad, pad])).tolist()

    if variant == 'demo':
        sync, edge = 'loose', 20
        track = dict(lr=0.0005, pixels=1000, iters=30)
        mapping = dict(every_frame=10, pixels=1000,
                       iters_first=iters_first or 400, iters=10,
                       mapping_window_size=10)
    else:
        sync, edge = 'strict', 100
        track = dict(lr=0.001, pixels=200, iters=10)
        mapping = dict(every_frame=5, pixels=1000,
                       iters_first=iters_first or 1500, iters=60,
                       mapping_window_size=5)

    cfg = {
        'dataset': 'replica',
        'coarse': True,
        'sync_method': sync,
        'scale': 1,
        'verbose': False,
        'occupancy': True,
        'low_gpu_mem': False,
        'grid_len': {'coarse': 2.0, 'middle': 0.32, 'fine': 0.16,
                     'color': 0.16, 'bound_divisible': 0.32},
        'pretrained_decoders': {
            'coarse': os.path.join(REPO, 'pretrained', 'coarse.pt'),
            'middle_fine': os.path.join(REPO, 'pretrained',
                                        'middle_fine.pt')},
        'cam': {'H': cam['h'], 'W': cam['w'], 'fx': cam['fx'],
                'fy': cam['fy'], 'cx': cam['cx'], 'cy': cam['cy'],
                'png_depth_scale': 6553.5, 'crop_edge': 0},
        'rendering': {'N_samples': 32, 'N_surface': 16, 'N_importance': 0,
                      'lindisp': False, 'perturb': 0.0},
        'tracking': {'ignore_edge_W': edge, 'ignore_edge_H': edge,
                     'use_color_in_tracking': True, 'handle_dynamic': True,
                     'device': 'cpu',
                     'vis_freq': 10 ** 6, 'vis_inside_freq': 10 ** 6,
                     'w_color_loss': 0.5, 'seperate_LR': False,
                     # the reference hard-codes 1e-10 (Tracker.py:119);
                     # var_floor is an ours-only knob, so any other value
                     # makes the comparison asymmetric
                     'const_speed_assumption': True, 'var_floor': 1.0e-10,
                     'no_vis_on_first_frame': True, 'gt_camera': False,
                     **track},
        'mapping': {'device': 'cpu', 'color_refine': True,
                    'middle_iter_ratio': 0.4, 'fine_iter_ratio': 0.6,
                    'BA': ba, 'BA_cam_lr': 0.001,
                    # the reference NEVER optimizes the middle decoder
                    # (Mapper.py:418-423: only fine when not fix_fine, and
                    # color); train_middle is OUR from-scratch extension
                    # and with pretrained decoders loaded it perturbs the
                    # pretrained middle MLP every round — measured to
                    # drive 100-frame demo drift from ~6 cm to ~36 cm
                    'fix_fine': True, 'fix_color': False,
                    'train_middle': False,
                    'no_vis_on_first_frame': True,
                    'no_mesh_on_first_frame': True,
                    'no_log_on_first_frame': True,
                    'vis_freq': 10 ** 6, 'vis_inside_freq': 10 ** 6,
                    'mesh_freq': 10 ** 6, 'ckpt_freq': 10 ** 6,
                    'keyframe_every': kf_every,
                    'w_color_loss': 0.2, 'frustum_feature_selection': True,
                    'keyframe_selection_method': 'overlap',
                    'save_selected_keyframes_info': False,
                    'lr_first_factor': 5, 'lr_factor': 1,
                    'imap_decoders_lr': 0.001,
                    'stage': {
                        'coarse': {'decoders_lr': 0.0, 'coarse_lr': 0.001,
                                   'middle_lr': 0.0, 'fine_lr': 0.0,
                                   'color_lr': 0.0},
                        'middle': {'decoders_lr': 0.0, 'coarse_lr': 0.0,
                                   'middle_lr': 0.1, 'fine_lr': 0.0,
                                   'color_lr': 0.0},
                        'fine': {'decoders_lr': 0.0, 'coarse_lr': 0.0,
                                 'middle_lr': 0.005, 'fine_lr': 0.005,
                                 'color_lr': 0.0},
                        'color': {'decoders_lr': 0.005, 'coarse_lr': 0.0,
                                  'middle_lr': 0.005, 'fine_lr': 0.005,
                                  'color_lr': 0.005}},
                    'bound': bound,
                    'marching_cubes_bound': bound,
                    **mapping},
        'meshing': {'level_set': 0, 'resolution': 128, 'eval_rec': False,
                    'clean_mesh': True, 'depth_test': False,
                    'mesh_coarse_level': False,
                    'clean_mesh_bound_scale': 1.02,
                    'get_largest_components': False,
                    'color_mesh_extraction_method': 'direct_point_query',
                    'remove_small_geometry_threshold': 0.2},
        'model': {'c_dim': 32, 'coarse_bound_enlarge': 2,
                  'pos_embedding_method': 'fourier'},
        'data': {'dim': 3, 'input_folder': data_dir,
                 'output': os.path.join(root, 'out_default')},
    }
    path = os.path.join(root, 'config.yaml')
    with open(path, 'w') as f:
        yaml.safe_dump(cfg, f)
    return path


def ate_stats(est: np.ndarray, gt: np.ndarray) -> dict:
    sys.path.insert(0, REPO)
    from nice_slam_tpu.eval.ate import evaluate_ate
    n = len(est)
    raw = np.linalg.norm(est[:, :3, 3] - gt[:, :3, 3], axis=-1)
    out = {
        'ate_rmse_cm': round(float(evaluate_ate(est, gt)[
            'absolute_translational_error.rmse']) * 100, 3),
        'raw_mean_cm': round(float(raw.mean()) * 100, 3),
        'raw_max_cm': round(float(raw.max()) * 100, 3),
        'raw_first_half_cm': round(float(raw[:n // 2].mean()) * 100, 3),
        'raw_second_half_cm': round(float(raw[n // 2:].mean()) * 100, 3),
    }
    return out


def run_reference(cfg_path: str, out_ref: str) -> dict:
    t0 = time.perf_counter()
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, 'scripts',
                                      'ref_system_harness.py'),
         cfg_path, '--output', out_ref],
        cwd=REPO, capture_output=True, text=True)
    wall = time.perf_counter() - t0
    if r.returncode != 0:
        print('REFERENCE RUN FAILED:\n', r.stdout[-3000:],
              r.stderr[-5000:])
        sys.exit(1)
    tr = np.load(os.path.join(out_ref, 'traj.npz'))
    return {'wall_s': round(wall, 1),
            **ate_stats(tr['estimate_c2w'], tr['gt_c2w'])}


def recon_metrics(out_ours: str, variant: str) -> dict:
    """Reconstruction metrics of the run's final mesh vs the fixture
    scene's ANALYTIC ground-truth surface (io/datasets.synthetic_gt_mesh —
    the fixture generator renders exactly that scene), with the GT mesh
    frustum-CULLED to the trajectory's visible region first — the
    reference's own recipe (its eval runs against culled GT meshes,
    src/tools/cull_mesh.py; a 100-frame orbit sees ~1/3 of the room, so
    un-culled completion is dominated by never-observed walls).
    Ours-side only: the reference cannot extract meshes in this image
    (its mesher needs skimage marching_cubes + Open3D, absent here) —
    a tooling limitation, not a comparison choice."""
    from make_fixture_dataset import BOX
    from nice_slam_tpu.eval.recon import calc_3d_metric
    from nice_slam_tpu.io.datasets import synthetic_gt_mesh
    from nice_slam_tpu.mesh.mesher import load_ply
    from nice_slam_tpu.utils.ckpt import latest_checkpoint, load_checkpoint

    mesh_path = os.path.join(out_ours, 'mesh', 'final_mesh.ply')
    if not os.path.isfile(mesh_path):
        return {'recon': 'no final mesh'}
    rec_v, rec_t = load_ply(mesh_path)
    gt_v, gt_t = synthetic_gt_mesh(BOX)

    # frustum-cull GT to the GT trajectory (tools/cull_mesh.py math)
    ck = load_checkpoint(latest_checkpoint(os.path.join(out_ours, 'ckpts')))
    cam = CAMS[variant]
    seen = np.zeros((len(gt_v),), dtype=bool)
    homo = np.concatenate([gt_v, np.ones((len(gt_v), 1))], axis=1)
    for c2w in np.asarray(ck['gt_c2w']):
        w2c = np.linalg.inv(c2w)
        p = (homo @ w2c.T)[:, :3]
        z = p[:, 2] + 1e-5
        u = (cam['fx'] * (-p[:, 0]) + cam['cx'] * z) / z
        v = (cam['fy'] * p[:, 1] + cam['cy'] * z) / z
        seen |= (u > 0) & (u < cam['w']) & (v > 0) & (v < cam['h']) \
            & (z < 0)
    keep = seen[gt_t].any(axis=1)
    used = np.unique(gt_t[keep])
    remap = np.full((len(gt_v),), -1, dtype=np.int64)
    remap[used] = np.arange(len(used))
    gt_v, gt_t = gt_v[used], remap[gt_t[keep]]

    m = calc_3d_metric(rec_v, rec_t, gt_v, gt_t)
    return {k: round(v, 2) for k, v in m.items()}


def run_ours(cfg_path: str, out_ours: str, seed: int) -> dict:
    t0 = time.perf_counter()
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, 'run.py'), cfg_path,
         '--output', out_ours, '--seed', str(seed)],
        cwd=REPO, capture_output=True, text=True)
    wall = time.perf_counter() - t0
    if r.returncode != 0:
        print('OUR RUN FAILED:\n', r.stdout[-3000:], r.stderr[-5000:])
        sys.exit(1)
    from nice_slam_tpu.utils.ckpt import (latest_checkpoint,
                                          load_checkpoint)
    ck = load_checkpoint(latest_checkpoint(
        os.path.join(out_ours, 'ckpts')))
    return {'wall_s': round(wall, 1), 'seed': seed,
            **ate_stats(np.asarray(ck['estimate_c2w']),
                        np.asarray(ck['gt_c2w']))}


def main():
    import argparse
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('variant', nargs='?', default='replica',
                    choices=('demo', 'replica'))
    ap.add_argument('n_frames', nargs='?', type=int, default=100)
    ap.add_argument('--no-ba', action='store_true',
                    help='reproduce the round-4 BA-off rows (BA on is the '
                         'reference default, configs/nice_slam.yaml:60)')
    ap.add_argument('--skip-ref', action='store_true')
    ap.add_argument('--skip-ours', action='store_true')
    ap.add_argument('--iters-first', type=int, default=None)
    ap.add_argument('--step', type=float, default=0.02,
                    help='orbit step/frame; faster orbit => revisit within '
                         'a shorter run (orbit period = 2*pi/step frames)')
    ap.add_argument('--kf-every', type=int, default=5,
                    help='keyframe_every (50 = the reference Replica '
                         'default; 5 keeps short fixtures non-degenerate)')
    ap.add_argument('--runs-ref', type=int, default=1)
    ap.add_argument('--runs-ours', type=int, default=1)
    ap.add_argument('--seed0', type=int, default=0,
                    help='first seed for the ours-side repeats')
    ap.add_argument('--tag', type=str, default=None,
                    help='override the /tmp/nstpu_h2h_<tag> root')
    ap.add_argument('--recon', action='store_true',
                    help='add reconstruction metrics (acc/comp/ratio vs '
                         'the analytic GT mesh) to each ours-side run; '
                         'the reference side cannot mesh in this image '
                         '(no skimage/Open3D) — documented asymmetry')
    args = ap.parse_args()

    variant, n_frames, ba = args.variant, args.n_frames, not args.no_ba
    tag = args.tag or (f'{variant}_{n_frames}' + ('_ba' if ba else '')
                       + (f'_s{args.step}' if args.step != 0.02 else '')
                       + (f'_kf{args.kf_every}' if args.kf_every != 5
                          else ''))
    root = f'/tmp/nstpu_h2h_{tag}'
    os.makedirs(root, exist_ok=True)
    data_dir = build_fixture(variant, n_frames, root, args.step)
    cfg_path = build_config(variant, n_frames, root, data_dir, ba,
                            args.iters_first, args.kf_every)

    results = {'variant': variant, 'n_frames': n_frames, 'ba': ba,
               'kf_every': args.kf_every, 'step': args.step,
               'reference': [], 'ours': []}
    res_path = os.path.join(root, 'headtohead.json')

    def save():
        with open(res_path, 'w') as f:
            json.dump(results, f, indent=1)

    if not args.skip_ref:
        for k in range(args.runs_ref):
            out_ref = os.path.join(root, f'out_ref_{k}')
            row = run_reference(cfg_path, out_ref)
            results['reference'].append(row)
            print(json.dumps({'system': 'reference', 'run': k, **row}),
                  flush=True)
            save()

    if not args.skip_ours:
        for k in range(args.runs_ours):
            seed = args.seed0 + k
            out_ours = os.path.join(root, f'out_ours_{seed}')
            row = run_ours(cfg_path, out_ours, seed)
            if args.recon:
                row['recon'] = recon_metrics(out_ours, variant)
            results['ours'].append(row)
            print(json.dumps({'system': 'ours', **row}), flush=True)
            save()

    save()
    print(json.dumps(results), flush=True)


if __name__ == '__main__':
    main()
