"""Camera/ray layer tests (behavior parity with nerf/provider.py + get_rays)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamfusion_tpu import cameras
from dreamfusion_tpu.config import Config


def test_rand_poses_shapes_and_orthonormal():
    key = jax.random.PRNGKey(0)
    poses, dirs, thetas, phis = cameras.rand_poses(key, 32)
    assert poses.shape == (32, 4, 4)
    assert dirs.shape == (32,)
    R = poses[:, :3, :3]
    eye = jnp.einsum("bij,bkj->bik", R, R)
    np.testing.assert_allclose(np.asarray(eye), np.tile(np.eye(3), (32, 1, 1)),
                               atol=1e-5)
    # camera center radius within range
    r = jnp.linalg.norm(poses[:, :3, 3], axis=-1)
    assert float(r.min()) >= 1.0 - 1e-5 and float(r.max()) <= 1.5 + 1e-5
    # forward axis (3rd column) points from center to origin
    fwd = R[:, :, 2]
    expected = -poses[:, :3, 3] / r[:, None]
    np.testing.assert_allclose(np.asarray(fwd), np.asarray(expected), atol=1e-5)


def test_view_direction_buckets():
    # reference semantics: nerf/provider.py:52-69
    front = np.radians(60.0)
    over = np.radians(30.0)
    thetas = jnp.array([np.pi / 2] * 4 + [0.1, np.pi - 0.1])
    phis = jnp.array([0.5, 2.0, np.pi + 0.5, np.pi + 1.5, 0.0, 0.0])
    d = cameras.get_view_direction(thetas, phis, over, front)
    assert list(np.asarray(d)) == [0, 1, 2, 3, 4, 5]


def test_circle_poses_lookat_origin():
    poses, dirs = cameras.circle_poses(jnp.array([0.0, 90.0, 180.0]), radius=1.8)
    c = poses[:, :3, 3]
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(c, axis=-1)),
                               1.8, rtol=1e-5)
    fwd = poses[:, :3, 2]
    np.testing.assert_allclose(np.asarray(fwd),
                               np.asarray(-c / 1.8), atol=1e-5)


def _get_rays_numpy(pose, fx, fy, cx, cy, H, W):
    """Direct numpy port of the reference math (nerf/utils.py:42-106)."""
    i, j = np.meshgrid(np.arange(W) + 0.5, np.arange(H) + 0.5, indexing="xy")
    xs = (i.reshape(-1) - cx) / fx
    ys = (j.reshape(-1) - cy) / fy
    d = np.stack([xs, ys, np.ones_like(xs)], -1)
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    rays_d = d @ pose[:3, :3].T
    rays_o = np.broadcast_to(pose[:3, 3], rays_d.shape)
    return rays_o, rays_d


@pytest.mark.slow
def test_get_rays_matches_reference_math():
    key = jax.random.PRNGKey(1)
    poses, _, _, _ = cameras.rand_poses(key, 2)
    H = W = 16
    focal = float(cameras.fov_to_focal(60.0, H))
    intr = jnp.array([focal, focal, W / 2, H / 2])
    rays = cameras.get_rays(poses, intr, H, W)
    assert rays.origins.shape == (2, H * W, 3)
    for b in range(2):
        o_np, d_np = _get_rays_numpy(np.asarray(poses[b]), focal, focal,
                                     W / 2, H / 2, H, W)
        np.testing.assert_allclose(np.asarray(rays.directions[b]), d_np, atol=1e-5)
        np.testing.assert_allclose(np.asarray(rays.origins[b]), o_np, atol=1e-6)


@pytest.mark.slow
def test_sample_batches_jittable():
    cfg = Config(h=8, w=8, H=16, W=16)
    out = jax.jit(lambda k: cameras.sample_train_batch(k, cfg, B=2),
                  static_argnums=())(jax.random.PRNGKey(0))
    assert out["rays_o"].shape == (2, 64, 3)
    test = cameras.sample_test_batch(jnp.array([3]), 100, cfg)
    assert test["rays_d"].shape == (1, 256, 3)
    # directions are unit-norm
    n = jnp.linalg.norm(out["rays_d"], axis=-1)
    np.testing.assert_allclose(np.asarray(n), 1.0, atol=1e-5)
