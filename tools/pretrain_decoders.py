"""Train NICE decoders on a synthetic scene and export them as
reference-format pretrained blobs (coarse.pt / middle_fine.pt).

The real ConvONet blobs (/root/reference/.MISSING_LARGE_BLOBS) cannot be
fetched in this environment (no network), so this produces the same
artifact class offline: decoders trained on one scene, frozen and reused
on OTHER scenes exactly the way the reference consumes its blobs
(NICE_SLAM.py:210-241 + fix_fine, no train_middle).  tests/
test_pretrained_mode.py proves the transfer; scripts/bench_demo.py can
run the Demo soak in pretrained mode with these.

Usage:
  python tools/pretrain_decoders.py <outdir> [--frames N] [--iters-first I]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def train_decoders(n_frames=12, h=120, w=160, iters_first=800, iters=60,
                   box=None, seed=0, verbose=False):
    """Run a from-scratch SLAM session with all decoders trainable and
    return the converged decoder params."""
    from tests.util import make_test_cfg  # canonical small config
    from nice_slam_tpu.engine.slam import SlamSystem

    cfg = make_test_cfg(n_frames=n_frames, h=h, w=w)
    if box is not None:
        cfg['synthetic']['box'] = box
        pad = 0.3
        bound = (np.asarray(box) + np.array([-pad, pad])).tolist()
        cfg['mapping']['bound'] = bound
        cfg['mapping']['marching_cubes_bound'] = bound
    cfg['mapping'].update(iters_first=iters_first, iters=iters,
                          train_middle=True, fix_fine=False,
                          fix_color=False)
    cfg['verbose'] = verbose
    slam = SlamSystem(cfg, nice=True, output='/tmp/nstpu_pretrain',
                      seed=seed)
    slam.run()
    return slam.full_dec_params()


def main():
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
    ap = argparse.ArgumentParser()
    ap.add_argument('outdir', nargs='?', default='pretrained')
    ap.add_argument('--frames', type=int, default=12)
    ap.add_argument('--iters-first', type=int, default=800)
    args = ap.parse_args()

    from nice_slam_tpu.models.pretrain import save_torch_pretrain
    params = train_decoders(n_frames=args.frames,
                            iters_first=args.iters_first, verbose=True)
    os.makedirs(args.outdir, exist_ok=True)
    coarse_p = os.path.join(args.outdir, 'coarse.pt')
    mf_p = os.path.join(args.outdir, 'middle_fine.pt')
    save_torch_pretrain(params, coarse_p, mf_p)
    print(f'wrote {coarse_p} and {mf_p}')


if __name__ == '__main__':
    main()
