"""Canary for the v5e iMAP >=5000-ray mapping fault (VERDICT r3 #6).

BASELINE.md "Known current-stack fault": iMAP-budget mapping programs
with >=5000 rays per pass fault with `UNAVAILABLE: TPU device error`
when the grad step sits inside any loop construct; the shipped
workaround (`mapping.max_rays_per_pass`, auto-set to 4096 for iMAP on
TPU) costs ~5% throughput.  This probe runs the minimal faulting
program — one single-iteration 5000-ray iMAP map step, UNCHUNKED — in a
fresh process (a fault poisons the process's TPU client) and reports
whether the stack is fixed.

Exit status / JSON:
  {"fault": false}  stack fixed -> safe to run with max_rays_per_pass 0
                    (export NSTPU_IMAP_FAULT=0, or set
                    mapping.max_rays_per_pass: 0 in the config) and
                    recover the ~5%.
  {"fault": true}   fault still present -> keep the default chunking.

`scripts/bench_imap.py` runs this first and picks the mode accordingly.

Usage:
  python scripts/imap_fault_canary.py          # parent: spawns the probe
  python scripts/imap_fault_canary.py --probe  # child: runs the program
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe() -> None:
    """Run the minimal faulting program; exits nonzero on the fault."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nice_slam_tpu.core.cameras import Intrinsics
    from nice_slam_tpu.engine import mapper as M
    from nice_slam_tpu.models.decoders import (DecoderConfig,
                                               init_imap_decoder)
    from nice_slam_tpu.render.renderer import RenderConfig, SceneModel

    scale = 0.1
    intr = Intrinsics(H=680, W=1200, fx=600.0, fy=600.0, cx=599.5,
                      cy=339.5)
    bound = jnp.asarray([[-1.3, 7.4], [-3.1, 3.2], [-1.7, 2.3]]) * scale
    dcfg = DecoderConfig(pos_embedding_method='nerf')
    model = SceneModel(kind='imap', decoder=dcfg, bound=bound)
    rcfg = RenderConfig(n_samples=32, n_surface=0, n_importance=12,
                        occupancy=False, perturb=0.0)
    n_frames, pixels = 5, 5000   # >=5000 rays/pass = the faulting regime
    mcfg = M.MapperConfig(pixels=pixels, iters=1, ba=True,
                          window_size=n_frames,
                          keyframe_selection='global', w_color_loss=0.1,
                          max_rays_per_pass=0)   # UNCHUNKED on purpose
    key = jax.random.PRNGKey(0)
    params = init_imap_decoder(key, dcfg)
    step = M.make_map_step(model=model, rcfg=rcfg, mcfg=mcfg, intr=intr,
                           n_frames=n_frames, n_iters=1,
                           pix_per_frame=pixels // n_frames)
    rng = np.random.default_rng(0)
    colors = jnp.asarray(rng.random((n_frames, intr.H, intr.W, 3)),
                         jnp.float32)
    depths = jnp.asarray(
        (0.5 + rng.random((n_frames, intr.H, intr.W))) * scale,
        jnp.float32)
    cams = jnp.asarray([[1.0, 0, 0, 0, 0.01 * i, 0, 0]
                        for i in range(n_frames)], jnp.float32)
    opt_params = {'cams': cams, 'grids': {}, 'dec': {'imap': params}}
    lr_tab = jnp.asarray(M.lr_table(mcfg, 1, 1.0, False, True))
    stage_idx = jnp.asarray(M.stage_schedule(mcfg, 1, False))
    cam_mask = jnp.ones((n_frames,)).at[0].set(0.0)
    out, _, losses = step(opt_params, {}, None, lr_tab, stage_idx,
                          cam_mask, colors, depths, key)
    print(float(losses[0]))   # value fetch = real barrier


def main() -> dict:
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), '--probe'],
        capture_output=True, text=True, timeout=900)
    fault = r.returncode != 0
    detail = (r.stderr.strip().splitlines() or [''])[-1][:200] if fault \
        else ''
    out = {'fault': fault, 'detail': detail}
    print(json.dumps(out))
    return out


if __name__ == '__main__':
    if '--probe' in sys.argv:
        probe()
    else:
        main()
