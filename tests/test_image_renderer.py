"""ImageRenderer / render_views / metrics tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dreamfusion_tpu.models.dvgo import DVGOField
from dreamfusion_tpu.training.image_renderer import (ImageRenderer,
                                                     cord_spherical,
                                                     look_at_to_c2w,
                                                     render_round_views,
                                                     snap_shot)
from dreamfusion_tpu.training.metrics import rgb_psnr, rgb_ssim


def test_look_at_and_spherical():
    C = np.array([0.0, 0.0, 2.0])
    pose = look_at_to_c2w(C, np.zeros(3))
    # camera at C, looking toward origin: -z column points away from origin
    np.testing.assert_allclose(pose[:3, 3], C, atol=1e-6)
    fwd = -pose[:3, 2]
    np.testing.assert_allclose(fwd / np.linalg.norm(fwd), [0, 0, -1], atol=1e-5)
    v = cord_spherical(2.0, 0.0, 0.0)
    np.testing.assert_allclose(v, [0, 0, 2.0], atol=1e-6)


def test_image_renderer_and_orbit():
    field = DVGOField(world_size=(8, 8, 8), k0_dim=3, alpha_init=1e-2)
    o = jnp.zeros((4, 3))
    d = jnp.tile(jnp.array([[0.0, 0, 1.0]]), (4, 1))
    params = field.init(jax.random.PRNGKey(0), o, d, d, near=0.1, far=6.0,
                        bg=1.0, n_samples=field.n_render_samples(6.0),
                        method=field.render)
    r = ImageRenderer(field, params, near=0.1, far=6.0, batch_size=100)
    K = np.array([[12.0, 0, 6], [0, 12.0, 6], [0, 0, 1]])
    img = r.renderView(12, 12, K, look_at_to_c2w(np.array([0, 0, 3.0]),
                                                 np.zeros(3)))
    assert img.shape == (12, 12, 3)
    assert np.isfinite(img).all()
    frames = render_round_views(r, 8, 8, 10.0, num_imgs=3, dis=3.0)
    assert len(frames) == 3 and frames[0].shape == (8, 8, 3)
    snap = snap_shot(r, 8, 8, 10.0, position=[0, 0, 3.0])
    assert snap.shape == (8, 8, 3)


@pytest.mark.slow
def test_clip_r_precision():
    from dreamfusion_tpu.training.metrics import (
        clip_r_precision, clip_r_precision_from_renders)

    rng = np.random.RandomState(0)
    txt = rng.randn(5, 16)
    img = txt[[0, 1, 2]] + rng.randn(3, 16) * 0.01  # images match prompts 0-2
    assert clip_r_precision(img, txt, [0, 1, 2]) == 1.0
    assert clip_r_precision(img, txt, [4, 4, 4]) == 0.0
    # through the actual CLIP guidance plumbing (random-tiny weights)
    from dreamfusion_tpu.guidance.clip import build_clip_guidance

    g = build_clip_guidance("random-tiny")
    renders = rng.rand(2, 32, 32, 3).astype(np.float32)
    p = clip_r_precision_from_renders(g, renders, ["a cat", "a dog"], [0, 1])
    assert 0.0 <= p <= 1.0


def test_ssim_psnr():
    rng = np.random.RandomState(0)
    a = rng.rand(32, 32, 3)
    assert rgb_ssim(a, a) > 0.999
    assert rgb_psnr(a, a) >= 100 - 1e-6
    noisy = np.clip(a + rng.randn(32, 32, 3) * 0.1, 0, 1)
    s = rgb_ssim(a, noisy)
    assert 0.0 < s < 0.99
    assert 15 < rgb_psnr(a, noisy) < 30
