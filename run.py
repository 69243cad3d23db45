"""CLI entry point.

Functional parity target: /root/reference/run.py — same invocation shape:

    python run.py configs/Replica/room0.yaml [--nice|--imap]
                  [--input_folder F] [--output O] [--resume]

`--nice`/`--imap` pick the method (mutually exclusive, default nice) and the
matching base config (configs/nice_slam.yaml | configs/imap.yaml); the scene
YAML layers on top via `inherit_from`.  `--resume` (extension: the reference
cannot resume) restarts from the latest checkpoint in the output dir.
"""

from __future__ import annotations

import argparse


def main() -> None:
    parser = argparse.ArgumentParser(
        description='nice_slam_tpu: TPU-native neural implicit SLAM')
    parser.add_argument('config', type=str, help='path to scene config')
    parser.add_argument('--input_folder', type=str, default=None,
                        help='overrides the config input folder')
    parser.add_argument('--output', type=str, default=None,
                        help='overrides the config output dir')
    group = parser.add_mutually_exclusive_group()
    group.add_argument('--nice', action='store_true', default=True)
    group.add_argument('--imap', dest='nice', action='store_false')
    parser.add_argument('--resume', action='store_true',
                        help='resume from the latest checkpoint')
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--live', action='store_true',
                        help='write a self-refreshing live dashboard '
                             'under <output>/live while the run executes')
    parser.add_argument('--live_port', type=int, default=None,
                        help='also serve the live dashboard over HTTP')
    args = parser.parse_args()

    from nice_slam_tpu.utils.compilation_cache import enable as _cc
    _cc()
    # multi-host bring-up when launched under a pod launcher that exports
    # NSTPU_COORDINATOR / NSTPU_NUM_PROCESSES / NSTPU_PROCESS_ID
    from nice_slam_tpu.parallel.distributed import initialize_from_env
    if initialize_from_env():
        import jax
        print(f'INFO: multi-host runtime: process {jax.process_index()} of '
              f'{jax.process_count()}, {len(jax.devices())} global devices')
    from nice_slam_tpu.utils.config import load_config
    default = 'configs/nice_slam.yaml' if args.nice else 'configs/imap.yaml'
    cfg = load_config(args.config, default)
    if args.live or args.live_port is not None:
        cfg.setdefault('visualization', {})
        cfg['visualization']['live'] = True
        if args.live_port is not None:
            cfg['visualization']['live_port'] = args.live_port

    from nice_slam_tpu.engine.slam import SlamSystem
    slam = SlamSystem(cfg, nice=args.nice, input_folder=args.input_folder,
                      output=args.output, seed=args.seed)
    print(f'INFO: output folder is {slam.output}')
    print(f'INFO: meshes under {slam.output}/mesh, '
          f'checkpoints under {slam.output}/ckpts')

    start = 0
    if args.resume:
        import os
        from nice_slam_tpu.utils.ckpt import (latest_checkpoint,
                                              load_checkpoint)
        path = latest_checkpoint(os.path.join(slam.output, 'ckpts'))
        if path is not None:
            start = slam.restore(load_checkpoint(path))
            print(f'INFO: resumed from {path} at frame {start}')

    # run() (not a bare step loop) so the CLI path gets the prefetcher,
    # the profiler hook, and the final mesh join (engine/slam.py)
    slam.run(start)
    print('INFO: done.', slam.timers.summary())


if __name__ == '__main__':
    main()
