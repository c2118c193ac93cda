"""DVGO pretraining pipeline test: synthetic scene, coarse->fine, PSNR
improves, produced .dvgo loads back into the editing bridge."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamfusion_tpu.datasets.provider import ArrayDataset, DataLoaderLite
from dreamfusion_tpu.models.dvgo import DVGOField
from dreamfusion_tpu.training.dvgo_trainer import (DVGOStageConfig,
                                                   DVGOTrainer, psnr,
                                                   world_size_for)


def _synthetic_scene(n_views=6, H=12, W=12):
    """Cameras on a circle looking at a colored ball; ground truth rendered
    analytically (opaque red ball radius .4, white bg)."""
    rng = np.random.RandomState(0)
    data = {"HW": np.tile([[H, W]], (n_views, 1)), "near": 1.0, "far": 5.0}
    Ks, poses, imgs = [], [], []
    focal = 14.0
    for i in range(n_views):
        phi = 2 * np.pi * i / n_views
        c = np.array([2.5 * np.sin(phi), 0.0, 2.5 * np.cos(phi)])
        fwd = -c / np.linalg.norm(c)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd) * -1  # OpenGL convention: -z forward
        right /= np.linalg.norm(right)
        upv = np.cross(fwd, right) * -1
        c2w = np.eye(4)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, upv, -fwd, c
        poses.append(c2w)
        Ks.append(np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]]))
    poses = np.stack(poses).astype(np.float32)
    Ks = np.stack(Ks).astype(np.float32)

    from dreamfusion_tpu.datasets.rays import get_rays_of_a_view

    for i in range(n_views):
        ro, rd, vd = get_rays_of_a_view(H, W, Ks[i], poses[i])
        # analytic ray-sphere intersection
        o, d = ro.reshape(-1, 3), vd.reshape(-1, 3)
        b = np.sum(o * d, -1)
        cq = np.sum(o * o, -1) - 0.4 ** 2
        hit = b * b - cq > 0
        img = np.ones((H * W, 3), np.float32)
        img[hit] = [0.9, 0.1, 0.1]
        imgs.append(img.reshape(H, W, 3))
    data.update(images=np.stack(imgs), poses=poses, Ks=Ks,
                i_train=np.arange(n_views - 2),
                i_val=np.array([n_views - 2]), i_test=np.array([n_views - 1]),
                irregular_shape=False, depths=None,
                render_poses=poses[:2], hwf=[H, W, focal])
    return data


@pytest.mark.slow
def test_dvgo_trainer_improves_psnr():
    data = _synthetic_scene()
    from dreamfusion_tpu.datasets.rays import gather_training_rays

    rgb, ro, rd, vd, _ = gather_training_rays(data, {}, "i_train", "random")
    ds = ArrayDataset(rd, ro, vd, rgb)
    dl = DataLoaderLite(ds, 144, shuffle=True)

    ws = world_size_for((-1, -1, -1), (1, 1, 1), 16 ** 3)
    field = DVGOField(world_size=ws, k0_dim=3, rgbnet_name=None,
                      xyz_min=(-1, -1, -1), xyz_max=(1, 1, 1),
                      alpha_init=1e-2)
    stage = DVGOStageConfig(n_iters=60, lr_density=0.3, lr_k0=0.3,
                            batch_size=144, weight_entropy_last=0.001,
                            weight_rgbper=0.01)
    tr = DVGOTrainer(field, stage, near=data["near"], far=data["far"])
    psnr0 = tr.evaluate(dl, max_batches=2)
    tr.fit(dl, log_fn=None)
    psnr1 = tr.evaluate(dl, max_batches=2)
    assert psnr1 > psnr0 + 1.0, (psnr0, psnr1)


@pytest.mark.slow
def test_full_pipeline_and_dvgo_interop(tmp_path):
    from dreamfusion_tpu.training.nerf_pipeline import train_nerf_models

    data = _synthetic_scene()
    out = train_nerf_models({
        "cfg_data": None, "data_dict": data, "batch_size": 144,
        "coarse_model": {"num_voxels": 12 ** 3, "alpha_init": 1e-2},
        "coarse_train": {"n_iters": 40, "lr_density": 0.3, "lr_k0": 0.3},
        "fine_model": {"num_voxels": 16 ** 3, "alpha_init": 1e-2,
                       "k0_dim": 4, "rgbnet_width": 16, "rgbnet_depth": 3,
                       "posbase_pe": 2, "viewbase_pe": 2,
                       "bbox_thres": 1e-3},
        "fine_train": {"n_iters": 40, "lr_density": 0.3, "lr_k0": 0.1,
                       "lr_rgbnet": 1e-2},
        "save_name": str(tmp_path / "ball.dvgo"),
    }, log_fn=lambda *a: None)
    assert np.isfinite(out["test_psnr"])
    assert os.path.exists(out["save_path"])

    # load-back test (train_nerf_models.py:130) through the editing bridge
    from dreamfusion_tpu.models.kailu import (DVGOEditNetwork,
                                              peek_dvgo_checkpoint)

    meta = peek_dvgo_checkpoint(out["save_path"])
    assert meta["k0_dim"] == 4
    net = DVGOEditNetwork(bound=1.0, bg_radius=0.0, **meta)
    x = jnp.zeros((4, 3))
    d = jnp.ones((4, 3)) / jnp.sqrt(3.0)
    params = net.init(jax.random.PRNGKey(0), x, d, method=net.init_all)
    params = net.load_pretrained(params, out["save_path"])
    sigma, albedo = net.apply(params, x, method=net.common)
    assert sigma.shape == (4,) and albedo.shape == (4, 3)
    assert bool(jnp.all(jnp.isfinite(sigma)))

    # grid values survived the torch round-trip
    fine_p = out["fine_trainer"].params["params"]["density"]
    np.testing.assert_allclose(
        np.asarray(params["params"]["main"]["density"]),
        np.asarray(fine_p), atol=1e-6)


def test_pervoxel_lr_transform():
    import optax

    from dreamfusion_tpu.training.dvgo_trainer import scale_update_by_factors

    params = {"density": jnp.ones((2, 2)), "other": jnp.ones(3)}
    factors = {"density": jnp.array([[0.5, 1.0], [0.0, 2.0]]), "other": None}
    tx = optax.chain(optax.sgd(1.0), scale_update_by_factors(factors))
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    np.testing.assert_allclose(np.asarray(updates["density"]),
                               [[-0.5, -1.0], [0.0, -2.0]])
    np.testing.assert_allclose(np.asarray(updates["other"]), -1.0)
