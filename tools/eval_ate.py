"""ATE evaluation CLI.

Functional parity target: /root/reference/src/tools/eval_ate.py __main__
(:259-301): load the run's latest checkpoint, align the estimated
trajectory to ground truth (Horn), print the error stats, save a plot.

    python tools/eval_ate.py configs/Replica/room0.yaml [--output O] [--plot]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument('config', type=str)
    parser.add_argument('--output', type=str, default=None)
    parser.add_argument('--plot', action='store_true')
    args = parser.parse_args()

    from nice_slam_tpu.utils.config import load_config
    from nice_slam_tpu.utils.ckpt import latest_checkpoint, load_checkpoint
    from nice_slam_tpu.eval.ate import evaluate_ate

    cfg = load_config(args.config, 'configs/nice_slam.yaml')
    output = args.output or cfg['data']['output']
    path = latest_checkpoint(os.path.join(output, 'ckpts'))
    if path is None:
        raise SystemExit(f'no checkpoint found under {output}/ckpts')
    state = load_checkpoint(path)

    n = int(state['mapping_idx']) + 1
    stats = evaluate_ate(state['estimate_c2w'][:n], state['gt_c2w'][:n],
                         scale=float(cfg.get('scale', 1.0)))
    for k, v in stats.items():
        print(f'{k}: {v:.6f}' if isinstance(v, float) else f'{k}: {v}')

    if args.plot:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        est = state['estimate_c2w'][:n, :3, 3]
        gt = state['gt_c2w'][:n, :3, 3]
        fig, ax = plt.subplots(figsize=(6, 6))
        ax.plot(gt[:, 0], gt[:, 2], 'k-', label='ground truth')
        ax.plot(est[:, 0], est[:, 2], 'b-', label='estimated')
        ax.legend()
        ax.set_title(
            f"ATE RMSE: "
            f"{stats['absolute_translational_error.rmse']*100:.2f} cm")
        out_png = os.path.join(output, 'eval_ate_plot.png')
        fig.savefig(out_png, dpi=120)
        print(f'plot saved to {out_png}')


if __name__ == '__main__':
    main()
