"""Live visualization during a run.

Functional parity target: the reference shows the reconstruction AS IT
RUNS — `/root/reference/visualizer.py` + `src/tools/viz.py:180-209` feed an
Open3D window from a child process (mesh + camera trajectory updating per
frame).  This environment is headless, so the live view is a small
self-refreshing dashboard written under `<output>/live/` while the run
executes, optionally served over HTTP:

  * `traj.png`     — estimated vs GT trajectory (top-down + side view),
  * `mesh.png`     — the latest extracted mesh rendered (depth) from the
                     current estimated camera via the native rasterizer,
  * `panel.jpg`    — the most recent tracking/mapping residual panel,
  * `status.json`  — frame index, timers, pose error so far,
  * `index.html`   — auto-refreshing page tying it together.

Enable with `visualization.live: true` (or `run.py --live [--live_port P]`);
`visualization.live_freq` controls the update cadence (default: every 5
frames).  Everything runs on the host — no device work beyond reusing
panels the Visualizer already rendered, so the SLAM loop is not slowed.
"""

from __future__ import annotations

import json
import os
import shutil
import threading
import time

import numpy as np

_INDEX_HTML = """<!DOCTYPE html>
<html><head><meta charset="utf-8">
<meta http-equiv="refresh" content="2">
<title>nice_slam_tpu live</title>
<style>
 body {{ background:#111; color:#ddd; font-family:monospace; margin:1em; }}
 img {{ max-width:48%; vertical-align:top; margin:0.5%; }}
 .wide {{ max-width:97%; }}
 pre {{ color:#8f8; }}
</style></head><body>
<h2>nice_slam_tpu — live run</h2>
<pre id="status">loading…</pre>
<div>
 <img src="traj.png?t={t}" alt="trajectory">
 <img src="mesh.png?t={t}" alt="mesh">
</div>
<div><img class="wide" src="panel.jpg?t={t}" alt="residual panel"></div>
<script>
fetch('status.json?t=' + Date.now()).then(r => r.json()).then(s => {{
  document.getElementById('status').textContent =
    JSON.stringify(s, null, 2);
}});
</script>
</body></html>
"""


class LiveViewer:
    def __init__(self, live_dir: str, intr, *, freq: int = 5,
                 port: int | None = None, view_size: int = 360):
        self.live_dir = live_dir
        self.intr = intr
        self.freq = max(int(freq), 1)
        self.view_size = int(view_size)
        self._mesh_cache: tuple[str, float, tuple] | None = None
        self._server = None
        self._t0 = time.time()
        os.makedirs(live_dir, exist_ok=True)
        self._write_index()
        if port is not None:
            self._serve(int(port))

    def _write_index(self):
        with open(os.path.join(self.live_dir, 'index.html'), 'w') as f:
            f.write(_INDEX_HTML.format(t=int(self._t0)))

    def _serve(self, port: int):
        import functools
        from http.server import SimpleHTTPRequestHandler, ThreadingHTTPServer

        # method lookup resolves on the class, so log_message must be
        # overridden by subclassing (setting it on a functools.partial
        # does nothing) — otherwise every 2 s dashboard poll spams stderr
        class _QuietHandler(SimpleHTTPRequestHandler):
            def log_message(self, *a, **k):
                pass

        handler = functools.partial(_QuietHandler,
                                    directory=self.live_dir)
        host = os.environ.get('NSTPU_LIVE_HOST', '127.0.0.1')
        self._server = ThreadingHTTPServer((host, port), handler)
        t = threading.Thread(target=self._server.serve_forever, daemon=True)
        t.start()
        print(f'INFO: live view at http://localhost:'
              f'{self._server.server_address[1]}/ (serving {self.live_dir})')

    @property
    def port(self) -> int | None:
        return self._server.server_address[1] if self._server else None

    # ------------------------------------------------------------------

    def _plot_traj(self, est: np.ndarray, gt: np.ndarray, n: int):
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt

        e = est[:n, :3, 3]
        g = gt[:n, :3, 3]
        fig, axs = plt.subplots(1, 2, figsize=(8, 4))
        for ax, (a, b, name) in zip(axs, [(0, 2, 'top (x/z)'),
                                          (0, 1, 'side (x/y)')]):
            ax.plot(g[:, a], g[:, b], 'g-', lw=1, label='gt')
            ax.plot(e[:, a], e[:, b], 'r-', lw=1, label='estimate')
            ax.plot(e[-1:, a], e[-1:, b], 'r^', ms=8)
            ax.set_title(name)
            ax.set_aspect('equal', adjustable='datalim')
            ax.legend(loc='best', fontsize=8)
        fig.tight_layout()
        tmp = os.path.join(self.live_dir, '.traj.png')
        fig.savefig(tmp, dpi=80)
        plt.close(fig)
        os.replace(tmp, os.path.join(self.live_dir, 'traj.png'))

    def _latest_mesh(self, mesh_dir: str) -> str | None:
        try:
            plys = [os.path.join(mesh_dir, f) for f in os.listdir(mesh_dir)
                    if f.endswith('.ply')]
        except OSError:
            return None
        return max(plys, key=os.path.getmtime) if plys else None

    def _plot_mesh(self, mesh_dir: str, c2w: np.ndarray):
        path = self._latest_mesh(mesh_dir)
        if path is None:
            return
        mtime = os.path.getmtime(path)
        if self._mesh_cache and self._mesh_cache[:2] == (path, mtime):
            verts, tris = self._mesh_cache[2]
        else:
            from nice_slam_tpu.mesh.mesher import load_ply
            verts, tris = load_ply(path)
            self._mesh_cache = (path, mtime, (verts, tris))
        from nice_slam_tpu.mesh.native import rasterize_depth
        s = self.view_size
        scale = s / max(self.intr.H, self.intr.W)
        h = max(int(self.intr.H * scale), 2)
        w = max(int(self.intr.W * scale), 2)
        # the estimated pose is OpenGL-convention (y up, -z forward); the
        # rasterizer expects CV (+z forward) — flip the y/z columns
        cv = c2w.astype(np.float64).copy()
        cv[:3, 1] *= -1
        cv[:3, 2] *= -1
        w2c = np.linalg.inv(cv)
        d = rasterize_depth(verts.astype(np.float64), tris, w2c,
                            self.intr.fx * scale, self.intr.fy * scale,
                            self.intr.cx * scale, self.intr.cy * scale,
                            h, w)
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(5, 4))
        vmax = float(np.max(d)) or 1.0
        ax.imshow(d, cmap='plasma', vmin=0, vmax=vmax)
        ax.set_title(os.path.basename(path))
        ax.set_xticks([])
        ax.set_yticks([])
        fig.tight_layout()
        tmp = os.path.join(self.live_dir, '.mesh.png')
        fig.savefig(tmp, dpi=80)
        plt.close(fig)
        os.replace(tmp, os.path.join(self.live_dir, 'mesh.png'))

    # ------------------------------------------------------------------

    def update(self, idx: int, n_img: int, est_c2w: np.ndarray,
               gt_c2w: np.ndarray, *, mesh_dir: str | None = None,
               panel_path: str | None = None,
               timers: dict | None = None) -> bool:
        """Refresh the dashboard (called once per frame; renders only on
        the configured cadence and always on the final frame)."""
        if idx % self.freq != 0 and idx != n_img - 1:
            return False
        n = idx + 1
        self._plot_traj(est_c2w, gt_c2w, n)
        if mesh_dir is not None:
            self._plot_mesh(mesh_dir, est_c2w[idx])
        if panel_path and os.path.isfile(panel_path):
            shutil.copyfile(panel_path,
                            os.path.join(self.live_dir, 'panel.jpg'))
        err = float(np.linalg.norm(
            est_c2w[idx][:3, 3] - gt_c2w[idx][:3, 3]))
        status = {
            'frame': idx,
            'n_img': n_img,
            'pose_err_vs_gt_m': round(err, 5),
            'elapsed_s': round(time.time() - self._t0, 1),
            **(timers or {}),
        }
        tmp = os.path.join(self.live_dir, '.status.json')
        with open(tmp, 'w') as f:
            json.dump(status, f)
        os.replace(tmp, os.path.join(self.live_dir, 'status.json'))
        return True

    def close(self):
        if self._server is not None:
            self._server.shutdown()
            self._server = None
