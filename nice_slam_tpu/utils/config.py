"""Layered YAML config system (L6).

Functional parity target: /root/reference/src/config.py:10-59 — single
inheritance via an `inherit_from` key resolved recursively, leaf-wins deep
merge.  The key schema matches the reference's census (SURVEY.md §5.6) so a
user's existing per-scene YAML drops in unchanged.

On top of the raw dict this module builds the typed, static config objects
the jitted code needs (Intrinsics, GridConfig, DecoderConfig, RenderConfig).
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np
import yaml

from nice_slam_tpu.core.cameras import Intrinsics
from nice_slam_tpu.models.decoders import DecoderConfig
from nice_slam_tpu.models.grids import GridConfig, round_bound
from nice_slam_tpu.render.renderer import RenderConfig


def load_config(path: str, default_path: str | None = None) -> dict:
    """Load a YAML config, resolving the `inherit_from` chain; later files
    override earlier ones key-by-key (deep merge)."""
    with open(path, 'r') as f:
        special = yaml.full_load(f)

    inherit = special.get('inherit_from')
    if inherit is not None:
        # inherit_from paths are relative to the repo root in the reference
        # config tree; also try relative to the including file.
        if not os.path.exists(inherit):
            alt = os.path.join(os.path.dirname(path), inherit)
            inherit = alt if os.path.exists(alt) else inherit
        cfg = load_config(inherit, default_path)
    elif default_path is not None:
        with open(default_path, 'r') as f:
            cfg = yaml.full_load(f)
    else:
        cfg = {}

    deep_update(cfg, special)
    return cfg


def deep_update(dst: dict, src: dict) -> None:
    """Recursive leaf-wins merge of src into dst (config.py:45-59)."""
    for k, v in src.items():
        if isinstance(v, dict):
            node = dst.setdefault(k, {})
            if isinstance(node, dict):
                deep_update(node, v)
            else:
                dst[k] = dict(v)
        else:
            dst[k] = v


# ---------------------------------------------------------------------------
# Typed views
# ---------------------------------------------------------------------------

def intrinsics_from_cfg(cfg: dict) -> Intrinsics:
    """Camera intrinsics after crop_size / crop_edge preprocessing
    (NICE_SLAM.py:164-186)."""
    cam = cfg['cam']
    intr = Intrinsics(cam['H'], cam['W'], float(cam['fx']), float(cam['fy']),
                      float(cam['cx']), float(cam['cy']))
    if 'crop_size' in cam and cam['crop_size'] is not None:
        ch, cw = cam['crop_size']
        intr = intr.scaled_to(ch, cw)
    intr = intr.cropped_by(int(cam.get('crop_edge', 0)))
    return intr


def grid_config_from_cfg(cfg: dict) -> GridConfig:
    gl = cfg['grid_len']
    bound = round_bound(cfg['mapping']['bound'], gl['bound_divisible'],
                        scale=cfg.get('scale', 1.0))
    return GridConfig(
        bound=bound,
        coarse_grid_len=float(gl['coarse']),
        middle_grid_len=float(gl['middle']),
        fine_grid_len=float(gl['fine']),
        color_grid_len=float(gl['color']),
        c_dim=int(cfg['model']['c_dim']),
        coarse_bound_enlarge=float(cfg['model']['coarse_bound_enlarge']),
        coarse=bool(cfg['coarse']),
    )


def decoder_config_from_cfg(cfg: dict) -> DecoderConfig:
    return DecoderConfig(
        c_dim=int(cfg['model']['c_dim']),
        pos_embedding_method=cfg['model']['pos_embedding_method'],
        coarse=bool(cfg['coarse']),
        mm_precision=cfg['model'].get('decoder_matmul_precision'),
    )


def render_config_from_cfg(cfg: dict) -> RenderConfig:
    r = cfg['rendering']
    return RenderConfig(
        n_samples=int(r['N_samples']),
        n_surface=int(r['N_surface']),
        n_importance=int(r['N_importance']),
        lindisp=bool(r['lindisp']),
        perturb=float(r['perturb']),
        occupancy=bool(cfg['occupancy']),
        grad_z=bool(r.get('grad_z', False)),
    )


def scene_bound(cfg: dict) -> np.ndarray:
    return grid_config_from_cfg(cfg).bound_np


def get_model(cfg: dict, nice: bool = True, seed: int = 0):
    """Construct the scene model (reference `config.get_model`,
    src/config.py:63-79 + conv_onet/config.py:4-33).

    Returns (scene_model, decoder_params, grids) — the functional
    equivalent of the reference's nn.Module + shared grid dict.
    """
    import jax
    import jax.numpy as jnp

    from nice_slam_tpu.models.decoders import (
        init_imap_decoder, init_nice_decoders)
    from nice_slam_tpu.models.grids import init_grids, static_grid_shapes
    from nice_slam_tpu.render.renderer import SceneModel

    gcfg = grid_config_from_cfg(cfg)
    dcfg = decoder_config_from_cfg(cfg)
    key = jax.random.PRNGKey(seed)
    kg, kd = jax.random.split(key)
    if nice:
        model = SceneModel(
            kind='nice', decoder=dcfg, bound=jnp.asarray(gcfg.bound_np),
            coarse_bound=jnp.asarray(gcfg.coarse_bound_np),
            grid_shapes=static_grid_shapes(gcfg))
        return model, init_nice_decoders(kd, dcfg), init_grids(kg, gcfg)
    model = SceneModel(kind='imap', decoder=dcfg,
                       bound=jnp.asarray(gcfg.bound_np))
    return model, init_imap_decoder(kd, dcfg), {}
