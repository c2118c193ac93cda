"""Small parity-gap tests: metric_loss, Concat/Order datasets, depth rays,
DVGO depth losses."""

import numpy as np

import jax
import jax.numpy as jnp

from dreamfusion_tpu.datasets.provider import (ArrayDataset, ConcatDataset,
                                               OrderDataset)
from dreamfusion_tpu.models.dvgo import metric_loss, total_variation


def test_metric_loss_contrast():
    key = jax.random.PRNGKey(0)
    # a smooth field has TV << shuffled-TV -> metric loss strongly negative
    lin = jnp.linspace(0, 1, 8)
    smooth = jnp.broadcast_to(lin[None, :, None, None], (1, 8, 8, 8))
    ml_smooth = float(metric_loss(smooth, key))
    noise = jax.random.normal(key, (1, 8, 8, 8))
    ml_noise = float(metric_loss(noise, key))
    assert ml_smooth < ml_noise
    assert ml_smooth < 0


def test_concat_and_order_datasets():
    a = ArrayDataset(np.arange(3), np.array([0.9, 0.1, 0.5]))
    b = ArrayDataset(np.arange(3, 5), np.array([0.2, 0.8]))
    cat = ConcatDataset([a, b])
    assert len(cat) == 5
    ordered = OrderDataset(cat)
    np.testing.assert_array_equal(ordered.arrays[1],
                                  np.sort(cat.arrays[1]))


def test_random_depth_sampler():
    from dreamfusion_tpu.datasets.rays import gather_training_rays

    n, H, W = 2, 4, 4
    rng = np.random.RandomState(0)
    data = {
        "HW": np.tile([[H, W]], (n, 1)),
        "Ks": np.tile(np.array([[5.0, 0, 2], [0, 5, 2], [0, 0, 1]]), (n, 1, 1)),
        "poses": np.tile(np.eye(4), (n, 1, 1)),
        "images": rng.rand(n, H, W, 3).astype(np.float32),
        "depths": rng.rand(n, H, W).astype(np.float32) * 5,
        "i_train": np.arange(n),
    }
    rgb, ro, rd, vd, _ = gather_training_rays(data, {}, "i_train",
                                              "random_depth")
    assert rgb.shape == (n * H * W, 4)  # rgb + depth channel
    np.testing.assert_allclose(rgb[:, 3].reshape(n, H, W),
                               data["depths"], rtol=1e-6)
