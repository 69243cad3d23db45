"""RGB-D sequence ingest (L5) — host-side, numpy/cv2.

Functional parity target: /root/reference/src/utils/datasets.py.  Each
loader yields (index, color [H,W,3] float in [0,1], depth [H,W] float
meters*scale, c2w [4,4]) with these conventions preserved exactly:
  * colors read BGR and converted to RGB, /255 (datasets.py:80-91);
  * depth PNGs divided by `png_depth_scale`, then * scale (:92-96);
  * optional undistortion applies to color only (:85-88);
  * optional `crop_size` resize (bilinear color / nearest depth) and
    `crop_edge` crop (:97-110);
  * every pose loader flips the y and z columns (OpenGL-style camera,
    :146-147, :184-185, :219-220, :321-322);
  * pose translations scale with the global `scale` (:112);
  * TUM: timestamp association with max_dt=0.08, frame-rate 32 subsample,
    first pose rebased to identity (:262-320);
  * CoFusion: EXR depth, identity poses (:225-245);
  * Azure: Open3D .log trajectory or identity (:154-192).

Additions over the reference: a `synthetic` dataset (an analytic box room
rendered to RGB-D) used by the test-suite and benchmarks — the reference
has no runnable fixture at all (SURVEY.md §4).
"""

from __future__ import annotations

import glob
import os

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover - cv2 is present in the target image
    cv2 = None

DATASET_REGISTRY = {}


def register(name):
    def deco(cls):
        DATASET_REGISTRY[name] = cls
        return cls
    return deco


def get_dataset(cfg: dict, input_folder: str | None = None,
                scale: float | None = None):
    scale = cfg.get('scale', 1.0) if scale is None else scale
    return DATASET_REGISTRY[cfg['dataset']](cfg, input_folder, scale)


def _intrinsics_matrix(fx, fy, cx, cy):
    k = np.eye(3)
    k[0, 0], k[1, 1], k[0, 2], k[1, 2] = fx, fy, cx, cy
    return k


class BaseDataset:
    """Index-addressable frame reader."""

    def __init__(self, cfg: dict, input_folder: str | None, scale: float):
        cam = cfg['cam']
        self.name = cfg['dataset']
        self.scale = scale
        self.png_depth_scale = cam.get('png_depth_scale', 1000.0)
        self.H, self.W = cam['H'], cam['W']
        self.fx, self.fy = cam['fx'], cam['fy']
        self.cx, self.cy = cam['cx'], cam['cy']
        self.distortion = (np.array(cam['distortion'])
                           if 'distortion' in cam else None)
        self.crop_size = cam.get('crop_size')
        self.crop_edge = int(cam.get('crop_edge', 0))
        self.input_folder = (input_folder if input_folder is not None
                             else cfg['data']['input_folder'])
        self.color_paths: list[str] = []
        self.depth_paths: list[str] = []
        self.poses: list[np.ndarray] = []

    def __len__(self):
        return self.n_img

    def _read_depth(self, path: str) -> np.ndarray:
        if path.endswith('.exr'):
            # the reference divides EXR depth by png_depth_scale too
            # (datasets.py:92; CoFusion configs set it to 1.0)
            return _read_exr_depth(path) / self.png_depth_scale
        d = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        return d.astype(np.float32) / self.png_depth_scale

    def __getitem__(self, index: int):
        color = cv2.imread(self.color_paths[index])
        depth = self._read_depth(self.depth_paths[index])
        if self.distortion is not None:
            k = _intrinsics_matrix(self.fx, self.fy, self.cx, self.cy)
            color = cv2.undistort(color, k, self.distortion)
        color = cv2.cvtColor(color, cv2.COLOR_BGR2RGB).astype(np.float32)
        color = color / 255.0
        depth = depth.astype(np.float32) * self.scale
        h, w = depth.shape
        if color.shape[:2] != (h, w):
            color = cv2.resize(color, (w, h))
        if self.crop_size is not None:
            # the reference resizes with torch F.interpolate — bilinear
            # align_corners=True for color, 'nearest' for depth
            # (datasets.py:97-104); cv2.resize uses half-pixel alignment
            # and WOULD deviate, so these reimplement torch's exact
            # coordinate conventions
            ch, cw = self.crop_size
            color = _resize_bilinear_align_corners(color, ch, cw)
            depth = _resize_nearest(depth, ch, cw)
        e = self.crop_edge
        if e > 0:
            color = color[e:-e, e:-e]
            depth = depth[e:-e, e:-e]
        pose = self.poses[index].copy()
        pose[:3, 3] *= self.scale
        return index, color, depth, pose.astype(np.float32)


def _resize_bilinear_align_corners(img: np.ndarray, ch: int, cw: int
                                   ) -> np.ndarray:
    """Bilinear resize with torch's align_corners=True convention: source
    coordinate = dst * (in - 1) / (out - 1) (F.interpolate,
    reference datasets.py:100-101).  img is [H, W, C]."""
    h, w = img.shape[:2]
    ys = (np.arange(ch, dtype=np.float64) * (h - 1) / max(ch - 1, 1))
    xs = (np.arange(cw, dtype=np.float64) * (w - 1) / max(cw - 1, 1))
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (ys - y0).astype(img.dtype)[:, None, None]
    wx = (xs - x0).astype(img.dtype)[None, :, None]
    top = img[y0][:, x0] * (1 - wx) + img[y0][:, x1] * wx
    bot = img[y1][:, x0] * (1 - wx) + img[y1][:, x1] * wx
    return top * (1 - wy) + bot * wy


def _resize_nearest(img: np.ndarray, ch: int, cw: int) -> np.ndarray:
    """Nearest resize with torch's 'nearest' convention: source index =
    floor(dst * in / out) (F.interpolate, reference datasets.py:102-103)."""
    h, w = img.shape[:2]
    ys = np.minimum((np.arange(ch) * h) // ch, h - 1)
    xs = np.minimum((np.arange(cw) * w) // cw, w - 1)
    return img[ys][:, xs]


def _flip_yz(c2w: np.ndarray) -> np.ndarray:
    out = c2w.copy()
    out[:3, 1] *= -1
    out[:3, 2] *= -1
    return out


def _read_exr_depth(filename: str) -> np.ndarray:
    """CoFusion depth is EXR; decoded by the first-party codec (io/exr.py).
    The reference used the OpenEXR package (datasets.py:12-44), which —
    like an EXR-enabled OpenCV — is absent from this environment."""
    from nice_slam_tpu.io.exr import read_exr_depth
    return read_exr_depth(filename)


@register('replica')
class Replica(BaseDataset):
    def __init__(self, cfg, input_folder, scale):
        super().__init__(cfg, input_folder, scale)
        self.color_paths = sorted(
            glob.glob(f'{self.input_folder}/results/frame*.jpg'))
        self.depth_paths = sorted(
            glob.glob(f'{self.input_folder}/results/depth*.png'))
        self.n_img = len(self.color_paths)
        with open(f'{self.input_folder}/traj.txt') as f:
            lines = f.readlines()
        self.poses = [
            _flip_yz(np.array(list(map(float, lines[i].split())),
                              dtype=np.float64).reshape(4, 4))
            for i in range(self.n_img)]


@register('scannet')
class ScanNet(BaseDataset):
    def __init__(self, cfg, input_folder, scale):
        super().__init__(cfg, input_folder, scale)
        root = os.path.join(self.input_folder, 'frames')
        bynum = lambda p: int(os.path.basename(p).split('.')[0])
        self.color_paths = sorted(
            glob.glob(os.path.join(root, 'color', '*.jpg')), key=bynum)
        self.depth_paths = sorted(
            glob.glob(os.path.join(root, 'depth', '*.png')), key=bynum)
        pose_paths = sorted(
            glob.glob(os.path.join(root, 'pose', '*.txt')), key=bynum)
        self.poses = []
        for p in pose_paths:
            mat = np.loadtxt(p).reshape(4, 4)
            self.poses.append(_flip_yz(mat))
        self.n_img = len(self.color_paths)


@register('cofusion')
class CoFusion(BaseDataset):
    def __init__(self, cfg, input_folder, scale):
        super().__init__(cfg, input_folder, scale)
        self.color_paths = sorted(
            glob.glob(os.path.join(self.input_folder, 'colour', '*.png')))
        self.depth_paths = sorted(
            glob.glob(os.path.join(self.input_folder, 'depth_noise', '*.exr')))
        self.n_img = len(self.color_paths)
        # CoFusion's frame has no usable alignment; identity proxies are fine
        # for ATE (trajectories are aligned before scoring), datasets.py:237-245
        self.poses = [np.eye(4) for _ in range(self.n_img)]


@register('azure')
class Azure(BaseDataset):
    def __init__(self, cfg, input_folder, scale):
        super().__init__(cfg, input_folder, scale)
        self.color_paths = sorted(
            glob.glob(os.path.join(self.input_folder, 'color', '*.jpg')))
        self.depth_paths = sorted(
            glob.glob(os.path.join(self.input_folder, 'depth', '*.png')))
        self.n_img = len(self.color_paths)
        log = os.path.join(self.input_folder, 'scene', 'trajectory.log')
        self.poses = []
        if os.path.exists(log):
            with open(log) as f:
                content = f.readlines()
            for i in range(0, len(content), 5):
                mat = np.array(
                    list(map(float,
                             ''.join(content[i + 1:i + 5]).split()))
                ).reshape(4, 4)
                self.poses.append(_flip_yz(mat))
        else:
            self.poses = [np.eye(4) for _ in range(self.n_img)]


@register('tumrgbd')
class TumRGBD(BaseDataset):
    def __init__(self, cfg, input_folder, scale, frame_rate: int = 32):
        super().__init__(cfg, input_folder, scale)
        root = self.input_folder
        pose_file = os.path.join(root, 'groundtruth.txt')
        if not os.path.isfile(pose_file):
            pose_file = os.path.join(root, 'pose.txt')
        images = np.loadtxt(os.path.join(root, 'rgb.txt'), dtype=str)
        depths = np.loadtxt(os.path.join(root, 'depth.txt'), dtype=str)
        posesd = np.loadtxt(pose_file, dtype=np.float64, skiprows=1)

        t_img = images[:, 0].astype(np.float64)
        t_dep = depths[:, 0].astype(np.float64)
        t_pose = posesd[:, 0]

        # associate each image to the nearest depth and pose (max_dt 0.08)
        assoc = []
        for i, t in enumerate(t_img):
            j = int(np.argmin(np.abs(t_dep - t)))
            k = int(np.argmin(np.abs(t_pose - t)))
            if abs(t_dep[j] - t) < 0.08 and abs(t_pose[k] - t) < 0.08:
                assoc.append((i, j, k))

        # subsample to the target frame rate
        keep = [0]
        for n in range(1, len(assoc)):
            if t_img[assoc[n][0]] - t_img[assoc[keep[-1]][0]] \
                    > 1.0 / frame_rate:
                keep.append(n)

        inv_first = None
        for n in keep:
            i, j, k = assoc[n]
            self.color_paths.append(os.path.join(root, str(images[i, 1])))
            self.depth_paths.append(os.path.join(root, str(depths[j, 1])))
            c2w = _pose_from_quat(posesd[k, 1:])
            if inv_first is None:
                inv_first = np.linalg.inv(c2w)
                c2w = np.eye(4)
            else:
                c2w = inv_first @ c2w
            self.poses.append(_flip_yz(c2w))
        self.n_img = len(self.color_paths)


def _pose_from_quat(pvec: np.ndarray) -> np.ndarray:
    """[tx ty tz qx qy qz qw] -> 4x4 (TUM groundtruth convention)."""
    tx, ty, tz, qx, qy, qz, qw = pvec[:7]
    n = qw * qw + qx * qx + qy * qy + qz * qz
    s = 2.0 / n
    rot = np.array([
        [1 - s * (qy * qy + qz * qz), s * (qx * qy - qz * qw),
         s * (qx * qz + qy * qw)],
        [s * (qx * qy + qz * qw), 1 - s * (qx * qx + qz * qz),
         s * (qy * qz - qx * qw)],
        [s * (qx * qz - qy * qw), s * (qy * qz + qx * qw),
         1 - s * (qx * qx + qy * qy)],
    ])
    pose = np.eye(4)
    pose[:3, :3] = rot
    pose[:3, 3] = (tx, ty, tz)
    return pose


@register('synthetic')
class SyntheticBox(BaseDataset):
    """Analytic box-room RGB-D sequence for tests/benchmarks.

    A camera orbits inside an axis-aligned box; depth is the exact ray/box
    exit distance and color is a smooth function of the hit point, so SLAM
    quality is measurable without any downloaded data.
    """

    # analytic rendering is CPU-heavy (~0.7 s/frame at 680x1200) and
    # releases the GIL; let the Prefetcher parallelize it
    prefetch_workers = 4

    def __init__(self, cfg, input_folder, scale):
        super().__init__(cfg, input_folder, scale)
        syn = cfg.get('synthetic', {})
        self.n_img = int(syn.get('n_frames', 40))
        self.box = np.array(syn.get('box', [[-3, 3], [-2.5, 2.5], [-2, 2]]),
                            dtype=np.float64)
        radius = float(syn.get('radius', 0.8))
        # per-frame angular step; default ~0.02 rad keeps inter-frame motion
        # in the few-cm range of real handheld RGB-D sequences
        step = float(syn.get('step', 0.02))
        # multiplicative depth noise sigma (fraction of depth), mimicking a
        # real RGB-D sensor so fits can't collapse to zero variance
        self.noise = float(syn.get('noise', 0.003))
        self.poses = []
        for t in range(self.n_img):
            ang = step * t
            c2w = np.eye(4)
            cy, sy = np.cos(ang * 0.5), np.sin(ang * 0.5)
            c2w[:3, :3] = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
            c2w[:3, 3] = [radius * np.cos(ang), 0.05 * np.sin(ang),
                          radius * np.sin(ang)]
            self.poses.append(c2w)

    def __getitem__(self, index: int):
        pose = self.poses[index].copy()
        color, depth = render_box_frame(
            pose, self.H, self.W, self.fx, self.fy, self.cx, self.cy,
            self.box)
        if self.noise > 0:
            rng = np.random.default_rng(1000 + index)
            depth = depth * (1.0 + self.noise
                             * rng.standard_normal(depth.shape))
            color = np.clip(
                color + 3 * self.noise * rng.standard_normal(color.shape),
                0.0, 1.0)
        pose[:3, 3] *= self.scale
        return (index, color.astype(np.float32),
                depth.astype(np.float32) * self.scale,
                pose.astype(np.float32))


def synthetic_gt_mesh(box, obstacles=None, resolution=192):
    """Exact ground-truth surface mesh of the synthetic scene (room walls
    + obstacle faces), for reconstruction-metric acceptance runs
    (tools/eval_recon.py against a SLAM mesh of the `synthetic` dataset).

    The free-space field f(p) = min(room interior SDF, -obstacle interior
    SDFs) is analytic; its zero level set is the scene surface, extracted
    with the native marching tetrahedra at `resolution`^3 (vertex error
    bounded by the cell diagonal).
    Returns (vertices [N, 3], triangles [M, 3]).
    """
    from nice_slam_tpu.mesh.native import marching_tetrahedra
    box = np.asarray(box, dtype=np.float64)
    if obstacles is None:
        obstacles = default_obstacles(box)
    pad = 0.05 * (box[:, 1] - box[:, 0])
    xs = np.linspace(box[0, 0] - pad[0], box[0, 1] + pad[0], resolution)
    ys = np.linspace(box[1, 0] - pad[1], box[1, 1] + pad[1], resolution)
    zs = np.linspace(box[2, 0] - pad[2], box[2, 1] + pad[2], resolution)
    X, Y, Z = np.meshgrid(xs, ys, zs, indexing='ij')
    p = np.stack([X, Y, Z], axis=-1)

    def inside_sdf(b):
        """Positive inside box b, = distance to the nearest face."""
        lo = p - b[:, 0]
        hi = b[:, 1] - p
        return np.minimum(lo.min(axis=-1), hi.min(axis=-1))

    f = inside_sdf(box)
    for ob in obstacles:
        f = np.minimum(f, -inside_sdf(np.asarray(ob, dtype=np.float64)))
    return marching_tetrahedra(f.astype(np.float32), xs, ys, zs, 0.0)


def default_obstacles(box):
    """A few interior boxes so depth varies with every pose axis (a bare
    room's flat walls leave x/y translation depth-unobservable, which makes
    tracking tests meaningless)."""
    lo = box[:, 0]
    ext = box[:, 1] - box[:, 0]

    def rel(a, b):
        return lo + np.asarray(a) * ext, lo + np.asarray(b) * ext

    return [np.stack(rel([0.10, 0.05, 0.05], [0.35, 0.55, 0.30]), axis=1),
            np.stack(rel([0.60, 0.10, 0.55], [0.85, 0.40, 0.80]), axis=1),
            np.stack(rel([0.40, 0.55, 0.15], [0.60, 0.90, 0.40]), axis=1)]


_DIRS_CACHE: dict = {}


def _camera_dirs(h, w, fx, fy, cx, cy) -> np.ndarray:
    """Cached camera-frame ray directions [h, w, 3] (f32)."""
    key = (h, w, fx, fy, cx, cy)
    if key not in _DIRS_CACHE:
        jj, ii = np.meshgrid(np.arange(h, dtype=np.float32),
                             np.arange(w, dtype=np.float32), indexing='ij')
        _DIRS_CACHE[key] = np.stack(
            [(ii - cx) / fx, -(jj - cy) / fy, -np.ones_like(ii)], axis=-1)
    return _DIRS_CACHE[key]


def render_box_frame(c2w, h, w, fx, fy, cx, cy, box, obstacles=None):
    """Exact RGB-D of the inside of a box room with interior box obstacles
    (camera along -z, y up).  f32 with cached camera-frame directions —
    generation is the wall-clock floor of every synthetic benchmark run."""
    if obstacles is None:
        obstacles = default_obstacles(box)
    box = np.asarray(box, dtype=np.float32)
    obstacles = [np.asarray(ob, dtype=np.float32) for ob in obstacles]
    dirs = _camera_dirs(h, w, fx, fy, cx, cy)
    rays_d = dirs @ c2w[:3, :3].T.astype(np.float32)
    rays_o = c2w[:3, 3].astype(np.float32)
    with np.errstate(divide='ignore', invalid='ignore'):
        t = (box[None, None, :, :] - rays_o[None, None, :, None]) / \
            rays_d[..., :, None]                       # [h, w, 3, 2]
        t_hit = np.min(np.max(t, axis=-1), axis=-1)    # room-wall exit
        for ob in obstacles:
            tb = (ob[None, None, :, :] - rays_o[None, None, :, None]) / \
                rays_d[..., :, None]
            t_near = np.max(np.min(tb, axis=-1), axis=-1)
            t_far = np.min(np.max(tb, axis=-1), axis=-1)
            hits = (t_near <= t_far) & (t_near > 1e-6)
            t_hit = np.where(hits, np.minimum(t_hit, t_near), t_hit)
    # rays_d has z-component -1 in camera frame, so the ray parameter t IS
    # the z-buffer depth the sensor would report
    depth = t_hit
    hit = rays_o + rays_d * t_hit[..., None]
    ext = box[:, 1] - box[:, 0]
    u = (hit - box[:, 0]) / ext
    color = np.stack([
        0.5 + 0.5 * np.sin(11.0 * u[..., 0]) * np.cos(9.0 * u[..., 1]),
        0.5 + 0.5 * np.sin(7.0 * u[..., 1] + 1.0) * np.cos(5.0 * u[..., 0]),
        0.5 + 0.5 * np.cos(13.0 * u[..., 2] + 2.0 * u[..., 0]),
    ], axis=-1)
    return np.clip(color, 0, 1), depth
