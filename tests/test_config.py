"""Config system: inherit_from chains, typed views, the shipped tree."""

import numpy as np

from nice_slam_tpu.utils.config import (
    deep_update, grid_config_from_cfg, intrinsics_from_cfg, load_config,
    render_config_from_cfg)


def test_deep_update_leaf_wins():
    a = {'x': {'y': 1, 'z': 2}, 'k': 3}
    deep_update(a, {'x': {'y': 10}, 'n': 4})
    assert a == {'x': {'y': 10, 'z': 2}, 'k': 3, 'n': 4}


def test_inherit_chain_room0():
    cfg = load_config('configs/Replica/room0.yaml', 'configs/nice_slam.yaml')
    # leaf values
    assert cfg['mapping']['bound'] == [[-2.9, 8.9], [-3.2, 5.5], [-3.5, 3.3]]
    # dataset-base values
    assert cfg['tracking']['ignore_edge_W'] == 100
    assert cfg['cam']['H'] == 680
    # global-base values survive the merge
    assert cfg['coarse'] is True
    assert cfg['rendering']['N_samples'] == 32
    assert cfg['mapping']['stage']['middle']['middle_lr'] == 0.1


def test_imap_base():
    cfg = load_config('configs/Replica/room0_imap.yaml', 'configs/imap.yaml')
    assert cfg['occupancy'] is False
    assert cfg['scale'] == 0.1
    assert cfg['rendering']['N_importance'] == 12
    assert cfg['rendering']['N_surface'] == 0
    assert cfg['mapping']['keyframe_selection_method'] == 'global'


def test_typed_views():
    cfg = load_config('configs/Replica/room0.yaml', 'configs/nice_slam.yaml')
    intr = intrinsics_from_cfg(cfg)
    assert (intr.H, intr.W) == (680, 1200)
    gcfg = grid_config_from_cfg(cfg)
    b = gcfg.bound_np
    # bound rounded up to a multiple of bound_divisible (0.32)
    ext = b[:, 1] - b[:, 0]
    np.testing.assert_allclose(ext % 0.32, 0, atol=1e-5)
    assert (ext >= np.array([11.8, 8.7, 6.8])).all()
    rcfg = render_config_from_cfg(cfg)
    assert rcfg.occupancy and rcfg.n_samples == 32


def test_decoder_matmul_precision_plumbs():
    from nice_slam_tpu.utils.config import decoder_config_from_cfg
    cfg = load_config('configs/Replica/room0.yaml', 'configs/nice_slam.yaml')
    assert decoder_config_from_cfg(cfg).mm_precision is None  # default
    cfg['model']['decoder_matmul_precision'] = 'BF16_BF16_F32_X3'
    dcfg = decoder_config_from_cfg(cfg)
    assert dcfg.mm_precision == 'BF16_BF16_F32_X3'
    # the precision scope must not break forward or grad
    import jax
    import jax.numpy as jnp
    from nice_slam_tpu.models.decoders import imap_eval, init_imap_decoder
    dcfg = dcfg._replace(pos_embedding_method='nerf')
    params = init_imap_decoder(jax.random.PRNGKey(0), dcfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 3))
    out = imap_eval(params, x, dcfg)
    assert out.shape == (8, 4)
    g = jax.grad(lambda p: imap_eval(p, x, dcfg).sum())(params)
    assert jnp.isfinite(g['out']['w']).all()


def test_tum_crop_and_resize_intrinsics():
    cfg = load_config('configs/TUM_RGBD/freiburg1_desk.yaml',
                      'configs/nice_slam.yaml')
    intr = intrinsics_from_cfg(cfg)
    # crop_size [384, 512] then crop_edge 8: H=384-16, W=512-16
    assert (intr.H, intr.W) == (368, 496)
    # fx scaled by 512/640 = 0.8
    np.testing.assert_allclose(intr.fx, 517.3 * 0.8, rtol=1e-6)
    assert cfg['grid_len']['fine'] == 0.08


def test_all_shipped_configs_parse():
    import glob
    for path in glob.glob('configs/**/*.yaml', recursive=True):
        if 'imap' in path:
            cfg = load_config(path, 'configs/imap.yaml')
        else:
            cfg = load_config(path, 'configs/nice_slam.yaml')
        assert 'mapping' in cfg and 'cam' in cfg, path
