"""Mesh extraction (L5).

Functional parity target: /root/reference/src/utils/Mesher.py.
  * lattice query: `resolution` points per axis over marching_cubes_bound
    padded by 0.05 (:431-478); field = fine-stage occupancy; out-of-hull
    points forced to logit 100 (:563-575).
  * scene hull (:259-365): the reference TSDF-integrates keyframes with
    Open3D and takes the convex hull of the result + camera centers, scaled
    by clean_mesh_bound_scale.  Here the hull is built from back-projected
    keyframe depth points + camera centers directly (same hull: the TSDF
    surface is inside the hull of its own input points) using scipy's qhull.
  * iso-surface: first-party native marching tetrahedra (mesh/native)
    instead of skimage marching-cubes — watertight shared-vertex output.
  * cleaning (:611-652): cull faces whose three vertices were never seen by
    any (key)frame; connected-component filtering (largest, or drop
    components below an area threshold).
  * color (:654-695): 'direct_point_query' evaluates the color stage at the
    vertices (the reference's default method).
  * forecast path (:519-557): seen-region queried at fine, forecast region
    at coarse + 0.2 bias, unseen clamped to -100; forecast painted cyan.

TPU split: the field/color queries run on-device in fixed-size jitted
chunks (the 256^3 = 16.7M-point evaluation is the hot part and can be
ray-mesh sharded); hull/MT/culling run on host (native C++ / scipy).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from nice_slam_tpu.core.cameras import Intrinsics
from nice_slam_tpu.mesh.native import marching_tetrahedra
from nice_slam_tpu.render.renderer import SceneModel, eval_raw


class MesherConfig(NamedTuple):
    """Static meshing parameters (config `meshing.*`,
    configs/nice_slam.yaml:21-31)."""

    resolution: int = 256
    level_set: float = 0.0
    clean_mesh: bool = True
    depth_test: bool = False
    mesh_coarse_level: bool = False
    clean_mesh_bound_scale: float = 1.02
    get_largest_components: bool = False
    remove_small_geometry_threshold: float = 0.2
    color_mesh_extraction_method: str = 'direct_point_query'
    points_batch: int = 262144
    marching_cubes_bound: tuple = ()
    scale: float = 1.0


class Mesher:
    def __init__(self, mcfg: MesherConfig, model: SceneModel,
                 intr: Intrinsics, *, rcfg=None, sharded_mesh=None):
        from nice_slam_tpu.render.renderer import RenderConfig, render_rays
        if sharded_mesh is not None:
            # every chunk splits evenly over the mesh (the tail chunk is
            # zero-padded by _chunked either way)
            n_dev = sharded_mesh.devices.size
            mcfg = mcfg._replace(
                points_batch=-(-mcfg.points_batch // n_dev) * n_dev)
        self.cfg = mcfg
        # MEASURED (BASELINE.md r2): on the 256^3 lattice the fused Pallas
        # decoder is 2x SLOWER than XLA (15M vs 32M pts/s) — the kernel
        # boundary materializes the gathered grid features to HBM, while
        # XLA fuses gather+MLP into one pass.  XLA is therefore the
        # default; NSTPU_FUSED_MLP=1 opts into the kernel.
        if model.kind == 'nice' and os.environ.get('NSTPU_FUSED_MLP') == '1':
            model = model._replace(fused_eval=True)
        self.model = model
        self.intr = intr
        self.sharded_mesh = sharded_mesh
        self._ray_rcfg = rcfg if rcfg is not None else RenderConfig()
        self._prepare_fn = None
        self._jit_cache: dict = {}
        self._dev_cache: dict = {}
        self._eval_chunk = jax.jit(
            lambda params, grids, pts, stage: eval_raw(
                params, grids, pts, stage, self.model),
            static_argnames=('stage',))
        self._render_chunk = jax.jit(
            lambda params, grids, o, d, gd: render_rays(
                params, grids, o, d, stage='color', model=self.model,
                rcfg=self._ray_rcfg, gt_depth=gd))

    # ------------------------------------------------------------------
    # lattice + field evaluation
    # ------------------------------------------------------------------

    def lattice(self):
        """Query lattice: linspace over the padded marching-cubes bound
        (Mesher.py:431-478), x-major [R, R, R].  Cached — it is identical
        across extractions (building the 16.7M-point 256^3 grid costs ~8 s
        of numpy meshgrid/stack)."""
        if 'lattice' in self._dev_cache.get('host', {}):
            return self._dev_cache['host']['lattice']
        res = self.cfg.resolution
        b = np.asarray(self.cfg.marching_cubes_bound, dtype=np.float64)
        pad = 0.05
        xs = np.linspace(b[0, 0] - pad, b[0, 1] + pad, res)
        ys = np.linspace(b[1, 0] - pad, b[1, 1] + pad, res)
        zs = np.linspace(b[2, 0] - pad, b[2, 1] + pad, res)
        gx, gy, gz = np.meshgrid(xs, ys, zs, indexing='ij')
        pts = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
        out = (pts.astype(np.float32), xs, ys, zs)
        self._dev_cache.setdefault('host', {})['lattice'] = out
        return out

    def _chunked(self, points: np.ndarray, cache: str | None = None
                 ) -> tuple[jnp.ndarray, int]:
        """Pad host points to [n_chunks, points_batch, 3] on device with ONE
        transfer (per-chunk device_put pays ~25 ms dispatch latency each on
        the axon stack).  `cache` keeps the upload (the query lattice is
        identical across extractions)."""
        n = len(points)
        if cache is not None and cache in self._dev_cache:
            return self._dev_cache[cache], n
        chunk = self.cfg.points_batch
        nc = -(-n // chunk)
        p = np.pad(points, ((0, nc * chunk - n), (0, 0)))
        dev = jnp.asarray(p.reshape(nc, chunk, 3))
        if cache is not None:
            self._dev_cache[cache] = dev
        return dev, n

    def eval_field(self, params: Any, grids: Any, points: np.ndarray,
                   stage: str, column: slice | int = 3,
                   cache: str | None = None) -> np.ndarray:
        """On-device evaluation of the decoder at host points.

        One jitted `lax.map` over fixed-size chunks (compiled per chunk
        count), one host->device and one device->host transfer — the
        per-chunk dispatch+sync formulation spent ~0.2 s PER CHUNK blocking
        on the axon tunnel (~32 s of a 256^3 extraction)."""
        pts3, n = self._chunked(points, cache)
        key = ('eval', stage, pts3.shape[0], str(column),
               self.sharded_mesh is not None)
        if key not in self._jit_cache:
            from jax import lax

            if self.sharded_mesh is not None:
                # multi-chip lattice query (SURVEY §7.1, the reference's
                # 256^3..512^3 hot loop, Mesher.py:569-575): points shard
                # over the mesh, params/grids replicate, each chip decodes
                # its slab — embarrassingly parallel, no collectives
                from jax.sharding import PartitionSpec as P
                mesh = self.sharded_mesh
                axis = mesh.axis_names[0]   # 'rays' or 'kf' mesh, either
                assert pts3.shape[1] % mesh.devices.size == 0, \
                    (pts3.shape, mesh.devices.size)

                def local(params, grids, p):
                    return eval_raw(params, grids, p, stage,
                                    self.model)[:, column]

                shard_fn = jax.shard_map(
                    local, mesh=mesh,
                    in_specs=(P(), P(), P(axis)), out_specs=P(axis),
                    check_vma=False)

                def run(params, grids, pts3):
                    return lax.map(
                        lambda p: shard_fn(params, grids, p), pts3)
            else:
                def run(params, grids, pts3):
                    def one(p):
                        return eval_raw(params, grids, p, stage,
                                        self.model)[:, column]
                    return lax.map(one, pts3)
            self._jit_cache[key] = jax.jit(run)
        out = self._jit_cache[key](params, grids, pts3)
        out_np = np.array(out)   # writable copy (asarray views are RO)
        return out_np.reshape((-1,) + out_np.shape[2:])[:n]

    # ------------------------------------------------------------------
    # visibility
    # ------------------------------------------------------------------

    @partial(jax.jit, static_argnames=('self', 'edge', 'use_depth'))
    def _seen_one_frame(self, pts, c2w, depth, edge: int, use_depth: bool):
        """Project points into one frame (Mesher.point_masks math,
        :100-187-style projection, OpenGL camera: forward is -z)."""
        intr = self.intr
        w2c = jnp.linalg.inv(c2w)
        ones = jnp.ones_like(pts[:, :1])
        cam = (jnp.concatenate([pts, ones], axis=1) @ w2c.T)[:, :3]
        z = cam[:, 2] + 1e-5
        u = (intr.fx * (-cam[:, 0]) + intr.cx * z) / z
        v = (intr.fy * cam[:, 1] + intr.cy * z) / z
        inb = ((u < intr.W - edge) & (u > edge)
               & (v < intr.H - edge) & (v > edge) & (z < 0))
        if use_depth:
            from nice_slam_tpu.engine.frustum import \
                bilinear_sample_zero_border
            sampled = bilinear_sample_zero_border(depth, u, v)
            proj_depth = -z
            ok = (proj_depth > 0) & (proj_depth < sampled + 2.4) \
                & (sampled > 0)
            inb = inb & ok
        return inb

    def seen_mask(self, points: np.ndarray, c2ws: list[np.ndarray],
                  depths: list[np.ndarray] | None, *, edge: int = 0,
                  use_depth: bool = False, cache: str | None = None
                  ) -> np.ndarray:
        """Union of per-frame visibility over all given frames.

        One jitted program: `lax.map` over point chunks with a scan over
        the frame axis inside (frame count padded to power-of-two buckets
        so keyframe growth causes O(log F) recompiles, with padded frames
        masked out).  The per-(chunk, frame) dispatch formulation paid
        ~25 ms tunnel latency per call — O(chunks x frames) of it."""
        if len(c2ws) == 0:
            return np.zeros((len(points),), dtype=bool)
        pts3, n = self._chunked(points, cache)
        f = len(c2ws)
        f_pad = 1
        while f_pad < f:
            f_pad *= 2
        c2w_arr = np.stack([np.asarray(c) for c in c2ws]
                           + [np.eye(4, dtype=np.float32)] * (f_pad - f))
        fmask = np.zeros((f_pad,), np.bool_)
        fmask[:f] = True
        if use_depth:
            d_arr = np.stack([np.asarray(d) for d in depths]
                             + [np.zeros_like(depths[0])] * (f_pad - f))
        else:
            d_arr = np.zeros((1, 1, 1), np.float32)

        key = ('seen', pts3.shape[0], f_pad, edge, use_depth)
        if key not in self._jit_cache:
            from jax import lax

            def run(pts3, c2w_arr, d_arr, fmask):
                def one_chunk(p):
                    def body(acc, fr):
                        c2w, dep, m = fr
                        d = dep if use_depth else jnp.zeros(
                            (self.intr.H, self.intr.W))
                        s = self._seen_one_frame(p, c2w, d, edge, use_depth)
                        return acc | (s & m), None
                    init = jnp.zeros((p.shape[0],), dtype=bool)
                    deps = (d_arr if use_depth
                            else jnp.zeros((c2w_arr.shape[0], 1, 1)))
                    acc, _ = lax.scan(body, init, (c2w_arr, deps, fmask))
                    return acc
                return lax.map(one_chunk, pts3)
            self._jit_cache[key] = jax.jit(run)
        out = self._jit_cache[key](pts3, jnp.asarray(c2w_arr),
                                   jnp.asarray(d_arr), jnp.asarray(fmask))
        return np.asarray(out).reshape(-1)[:n]

    # ------------------------------------------------------------------
    # scene hull
    # ------------------------------------------------------------------

    def scene_hull(self, keyframes, depth_stride: int = 8):
        """Convex-hull half-space equations [F, 4] of the back-projected
        keyframe depth + camera centers, scaled by clean_mesh_bound_scale
        (Mesher.py:259-365 equivalent — see module docstring).

        A point p is inside iff max_f(eq[f, :3]·p + eq[f, 3]) <= 0 — a
        single [N, 3] x [3, F] matmul on device.  (The reference's
        trimesh/embree `contains` and a Delaunay find_simplex are exact on
        a convex hull too, but find_simplex walks ~2 us/point on the host:
        ~33 s for a 256^3 lattice vs ~10 ms as a TPU matmul.)"""
        from scipy.spatial import ConvexHull

        intr = self.intr
        jj, ii = np.meshgrid(
            np.arange(0, intr.H, depth_stride, dtype=np.float64),
            np.arange(0, intr.W, depth_stride, dtype=np.float64),
            indexing='ij')
        pts_all = []
        for kf in keyframes.frames:
            d = kf.depth[::depth_stride, ::depth_stride].astype(np.float64)
            valid = d > 0
            dirs = np.stack([(ii - intr.cx) / intr.fx,
                             -(jj - intr.cy) / intr.fy,
                             -np.ones_like(ii)], axis=-1)
            world = kf.est_c2w[:3, 3] + (dirs @ kf.est_c2w[:3, :3].T) \
                * d[..., None]
            pts_all.append(world[valid])
            pts_all.append(kf.est_c2w[None, :3, 3])
        cloud = np.concatenate(pts_all, axis=0)
        hull = ConvexHull(cloud)
        hull_pts = cloud[hull.vertices] * self.cfg.clean_mesh_bound_scale
        return ConvexHull(hull_pts).equations.astype(np.float32)

    def inside_hull(self, points: np.ndarray, equations: np.ndarray,
                    tol: float = 1e-6, cache: str | None = None
                    ) -> np.ndarray:
        """Vectorized convex-hull membership via the half-space equations —
        one jitted [chunk, 3] x [3, F] matmul pass over the point chunks
        (face count padded to power-of-two buckets with always-satisfied
        dummy planes)."""
        pts3, n = self._chunked(points, cache)
        f_pad = 16
        while f_pad < len(equations):
            f_pad *= 2
        eq = np.zeros((f_pad, 4), np.float32)
        eq[:, 3] = -1.0                       # dummy planes: always inside
        eq[:len(equations)] = equations

        key = ('hull', pts3.shape[0], f_pad)
        if key not in self._jit_cache:
            from jax import lax

            def run(pts3, eq):
                def one(p):
                    d = p @ eq[:, :3].T + eq[:, 3]
                    return jnp.max(d, axis=1) <= tol
                return lax.map(one, pts3)
            self._jit_cache[key] = jax.jit(run)
        out = self._jit_cache[key](pts3, jnp.asarray(eq))
        return np.asarray(out).reshape(-1)[:n]

    # ------------------------------------------------------------------
    # extraction
    # ------------------------------------------------------------------

    def extract(self, out_file: str, params: Any, grids: Any, keyframes,
                estimate_c2w: np.ndarray, idx: int, *,
                show_forecast: bool | None = None, color: bool = True,
                clean_mesh: bool | None = None,
                get_mask_use_all_frames: bool = False) -> str | None:
        """Full get_mesh pipeline (Mesher.py:480-716)."""
        cfg = self.cfg
        show_forecast = (cfg.mesh_coarse_level if show_forecast is None
                         else show_forecast)
        clean_mesh = cfg.clean_mesh if clean_mesh is None else clean_mesh
        if self.model.kind == 'nice' and self.model.expanded and grids:
            # one corner-expansion serves the whole lattice query (jitted:
            # eager pallas dispatch costs ~0.4 s/call on the axon stack)
            if self._prepare_fn is None:
                from nice_slam_tpu.models.grids import prepare_grids
                shapes = self.model.grid_shapes
                self._prepare_fn = jax.jit(
                    lambda g: prepare_grids(g, shapes))
            grids = self._prepare_fn(grids)

        points, xs, ys, zs = self.lattice()
        kf_c2ws = [kf.est_c2w for kf in keyframes.frames]
        kf_depths = [kf.depth for kf in keyframes.frames]

        geo_stage = 'fine' if self.model.kind == 'nice' else 'color'
        if show_forecast:
            seen = self.seen_mask(points, kf_c2ws, kf_depths,
                                  use_depth=cfg.depth_test, cache='lattice')
            forecast = self.seen_mask(points, kf_c2ws, None,
                                      edge=-1000, cache='lattice') & ~seen
            z = np.full((len(points),), -100.0, dtype=np.float32)
            if seen.any():
                z[seen] = self.eval_field(params, grids, points[seen],
                                          geo_stage)
            if forecast.any():
                z[forecast] = self.eval_field(
                    params, grids, points[forecast], 'coarse') + 0.2
        else:
            if len(keyframes.frames) > 0:
                eqs = self.scene_hull(keyframes)
                inside = self.inside_hull(points, eqs, cache='lattice')
            else:
                inside = np.ones((len(points),), dtype=bool)
            z = self.eval_field(params, grids, points, geo_stage,
                                cache='lattice')
            z[~inside] = 100.0
            seen = None

        field = z.reshape(cfg.resolution, cfg.resolution, cfg.resolution)
        verts, tris = marching_tetrahedra(field, xs, ys, zs, cfg.level_set)
        if len(verts) == 0:
            print('mesher: no surface crossed the level set')
            return None

        if clean_mesh:
            if get_mask_use_all_frames:
                frames = [estimate_c2w[i] for i in range(idx + 1)]
                v_seen = self.seen_mask(verts, frames, None,
                                        use_depth=False)
            else:
                v_seen = self.seen_mask(verts, kf_c2ws, kf_depths,
                                        use_depth=cfg.depth_test)
            # cull faces whose three vertices are all unseen (:629-638)
            keep = v_seen[tris].any(axis=1)
            tris = tris[keep]
            verts, tris = _compact(verts, tris)
            verts, tris = _filter_components(
                verts, tris,
                largest=cfg.get_largest_components,
                min_area=cfg.remove_small_geometry_threshold
                * (self.cfg.scale ** 2))

        colors = None
        if color and len(verts):
            if cfg.color_mesh_extraction_method == 'direct_point_query':
                rgb = self.eval_field(params, grids,
                                      verts.astype(np.float32),
                                      'color', column=slice(0, 3))
            else:  # 'render_ray_along_normal' (iMAP*, Mesher.py:668-695)
                rgb = self._color_along_normals(params, grids, verts, tris)
            colors = (np.clip(rgb, 0, 1) * 255).astype(np.uint8)
            if show_forecast and seen is not None:
                v_forecast = ~self.seen_mask(verts, kf_c2ws, kf_depths,
                                             use_depth=cfg.depth_test)
                colors[v_forecast] = np.array([0, 255, 255], np.uint8)

        verts = verts / cfg.scale
        save_ply(out_file, verts, tris, colors)
        return out_file

    def _color_along_normals(self, params, grids, verts, tris,
                             length: float = 0.1) -> np.ndarray:
        """Render a short ray along each vertex normal and take its color
        (the reference's iMAP* method, Mesher.py:668-695: origin offset
        -0.1 along the normal, gt_depth=0.1 so surface samples bracket the
        vertex)."""
        import jax.numpy as jnp
        from nice_slam_tpu.render.renderer import render_rays

        normals = vertex_normals(verts, tris)
        rays_o = (verts - length * normals).astype(np.float32)
        rays_d = normals.astype(np.float32)
        out = []
        chunk = self.cfg.points_batch // 64
        rcfg = self._ray_rcfg
        for i in range(0, len(verts), chunk):
            o = rays_o[i:i + chunk]
            d = rays_d[i:i + chunk]
            pad = chunk - len(o)
            if pad:
                o = np.pad(o, ((0, pad), (0, 0)))
                d = np.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
            gd = jnp.full((chunk,), length)
            _, _, col, _ = self._render_chunk(params, grids, jnp.asarray(o),
                                              jnp.asarray(d), gd)
            out.append(np.asarray(col)[:chunk - pad if pad else chunk])
        return np.concatenate(out, axis=0)


def vertex_normals(verts: np.ndarray, tris: np.ndarray) -> np.ndarray:
    """Area-weighted vertex normals (replaces o3d compute_vertex_normals
    for the ray-along-normal color path)."""
    fn = np.cross(verts[tris[:, 1]] - verts[tris[:, 0]],
                  verts[tris[:, 2]] - verts[tris[:, 0]])
    vn = np.zeros_like(verts)
    for k in range(3):
        np.add.at(vn, tris[:, k], fn)
    norm = np.linalg.norm(vn, axis=1, keepdims=True)
    norm[norm == 0] = 1.0
    return vn / norm


def _compact(verts: np.ndarray, tris: np.ndarray):
    """Drop vertices unused by any face and reindex."""
    used = np.unique(tris)
    remap = np.full((len(verts),), -1, dtype=np.int64)
    remap[used] = np.arange(len(used))
    return verts[used], remap[tris].astype(np.int32)


def _filter_components(verts: np.ndarray, tris: np.ndarray, *,
                       largest: bool, min_area: float):
    """Connected-component filtering (Mesher.py:640-652): keep the largest
    component, or drop components below the area threshold."""
    if len(tris) == 0:
        return verts, tris
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components

    n = len(verts)
    e = np.concatenate([tris[:, [0, 1]], tris[:, [1, 2]], tris[:, [0, 2]]])
    adj = coo_matrix((np.ones(len(e)), (e[:, 0], e[:, 1])), shape=(n, n))
    n_comp, labels = connected_components(adj, directed=False)
    if n_comp <= 1:
        return verts, tris

    face_label = labels[tris[:, 0]]
    a = verts[tris[:, 1]] - verts[tris[:, 0]]
    b = verts[tris[:, 2]] - verts[tris[:, 0]]
    face_area = 0.5 * np.linalg.norm(np.cross(a, b), axis=1)
    areas = np.bincount(face_label, weights=face_area, minlength=n_comp)

    if largest:
        keep_labels = {int(np.argmax(areas))}
    else:
        keep_labels = {i for i in range(n_comp) if areas[i] >= min_area}
    keep = np.isin(face_label, list(keep_labels))
    return _compact(verts, tris[keep])


# ---------------------------------------------------------------------------
# PLY I/O (replaces trimesh export/load for our needs)
# ---------------------------------------------------------------------------

def save_ply(path: str, verts: np.ndarray, tris: np.ndarray,
             colors: np.ndarray | None = None) -> None:
    """Binary little-endian PLY writer."""
    import struct
    n_v, n_f = len(verts), len(tris)
    with open(path, 'wb') as f:
        hdr = ['ply', 'format binary_little_endian 1.0',
               f'element vertex {n_v}',
               'property float x', 'property float y', 'property float z']
        if colors is not None:
            hdr += ['property uchar red', 'property uchar green',
                    'property uchar blue']
        hdr += [f'element face {n_f}',
                'property list uchar int vertex_indices', 'end_header']
        f.write(('\n'.join(hdr) + '\n').encode())
        if colors is not None:
            body_v = np.empty((n_v,), dtype=[('xyz', '<f4', 3),
                                             ('rgb', 'u1', 3)])
            body_v['xyz'] = verts.astype('<f4')
            body_v['rgb'] = colors.astype(np.uint8)
            f.write(body_v.tobytes())
        else:
            f.write(verts.astype('<f4').tobytes())
        counts = np.full((n_f, 1), 3, dtype=np.uint8)
        body = np.empty((n_f,), dtype=[('n', 'u1'), ('idx', '<i4', 3)])
        body['n'] = counts[:, 0]
        body['idx'] = tris.astype('<i4')
        f.write(body.tobytes())


def load_ply(path: str):
    """Minimal binary/ascii PLY reader for our own files and simple
    external ones (eval tooling).  Returns (verts, tris)."""
    with open(path, 'rb') as f:
        header = []
        while True:
            line = f.readline().decode('ascii', 'replace').strip()
            header.append(line)
            if line == 'end_header':
                break
        n_v = n_f = 0
        v_props = []
        fmt = 'binary_little_endian'
        elem = None
        for line in header:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == 'format':
                fmt = parts[1]
            elif parts[0] == 'element':
                elem = parts[1]
                if elem == 'vertex':
                    n_v = int(parts[2])
                elif elem == 'face':
                    n_f = int(parts[2])
            elif parts[0] == 'property' and elem == 'vertex' \
                    and parts[1] != 'list':
                v_props.append((parts[2], parts[1]))

        type_map = {'float': '<f4', 'float32': '<f4', 'double': '<f8',
                    'uchar': 'u1', 'uint8': 'u1', 'int': '<i4',
                    'uint': '<u4', 'short': '<i2', 'ushort': '<u2'}
        if fmt.startswith('ascii'):
            verts = np.zeros((n_v, 3), np.float32)
            for i in range(n_v):
                vals = f.readline().split()
                verts[i] = [float(vals[k]) for k in range(3)]
            tris = np.zeros((n_f, 3), np.int32)
            for i in range(n_f):
                vals = f.readline().split()
                tris[i] = [int(vals[1]), int(vals[2]), int(vals[3])]
            return verts, tris

        vdt = np.dtype([(name, type_map[t]) for name, t in v_props])
        vdata = np.frombuffer(f.read(n_v * vdt.itemsize), dtype=vdt,
                              count=n_v)
        verts = np.stack([vdata['x'], vdata['y'], vdata['z']],
                         axis=-1).astype(np.float32)
        fdt = np.dtype([('n', 'u1'), ('idx', '<i4', 3)])
        fdata = np.frombuffer(f.read(n_f * fdt.itemsize), dtype=fdt,
                              count=n_f)
        tris = fdata['idx'].astype(np.int32)
        return verts, tris
