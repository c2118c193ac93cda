"""CLIP (dreamfields-style) guidance.

Rebuilds nerf/clip.py: ViT-B/16 image/text encoders; the training loss is
-cos(image_features, text_features) on the rendered frame resized to 224 and
CLIP-normalized (nerf/clip.py:18-46). The negative prompt is ignored, like
the reference (nerf/clip.py:28).

Weights: `build_clip_guidance(weights)` loads a local/converted checkpoint
path or an HF hub name when network is available; `weights=None` or
'random-tiny' builds a small randomly initialized CLIP (offline tests,
shape-compatible with the real one).
"""

from __future__ import annotations

import hashlib
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dreamfusion_tpu.guidance import Guidance

_CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
_CLIP_STD = (0.26862954, 0.26130258, 0.27577711)

_TINY_TEXT = dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                  num_attention_heads=2, vocab_size=49408,
                  max_position_embeddings=77)
_TINY_VISION = dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                    num_attention_heads=2, image_size=224, patch_size=32)


def clip_preprocess(pred_rgb: jax.Array, image_size: int = 224) -> jax.Array:
    """[B,H,W,3] in [0,1] -> CLIP pixel_values [B,3,S,S]
    (reference: nerf/clip.py:18-21 — resize then normalize)."""
    B, H, W, _ = pred_rgb.shape
    x = jax.image.resize(pred_rgb, (B, image_size, image_size, 3), "bilinear")
    x = (x - jnp.array(_CLIP_MEAN)) / jnp.array(_CLIP_STD)
    return jnp.transpose(x, (0, 3, 1, 2))


def _fallback_tokenize(prompts, vocab_size: int, length: int = 77) -> np.ndarray:
    """Deterministic hash tokenizer for offline/random-weight runs. Not a BPE —
    only used when the real CLIPTokenizer vocab is unavailable."""
    out = np.zeros((len(prompts), length), np.int32)
    for i, p in enumerate(prompts):
        ids = [49406]  # bos
        for w in p.lower().split()[: length - 2]:
            h = int(hashlib.md5(w.encode()).hexdigest(), 16)
            ids.append(h % (vocab_size - 2) + 1)
        ids.append(49407)  # eos
        out[i, : len(ids)] = ids
        out[i, len(ids):] = 49407
    return out


def build_clip_guidance(weights: Optional[str] = None,
                        image_size: int = 224) -> Guidance:
    from transformers import CLIPConfig, FlaxCLIPModel

    if weights and weights not in ("random-tiny",):
        model = FlaxCLIPModel.from_pretrained(weights)
    else:
        cfg = CLIPConfig(text_config=_TINY_TEXT, vision_config=_TINY_VISION,
                         projection_dim=16)
        model = FlaxCLIPModel(cfg)

    vocab_size = model.config.text_config.vocab_size
    tokenizer = None
    if weights and weights not in ("random-tiny",):
        try:
            from transformers import CLIPTokenizerFast

            tokenizer = CLIPTokenizerFast.from_pretrained(weights)
        except Exception:
            tokenizer = None

    def get_text_embeds(prompts, negatives):
        # negatives ignored (reference: nerf/clip.py:28)
        if tokenizer is not None:
            ids = tokenizer(list(prompts), padding="max_length", max_length=77,
                            truncation=True, return_tensors="np").input_ids
        else:
            ids = _fallback_tokenize(list(prompts), vocab_size)
        z = model.get_text_features(ids, params=model.params)
        return z / jnp.linalg.norm(z, axis=-1, keepdims=True)

    def encode_images(params, pred_rgb):
        pixel_values = clip_preprocess(pred_rgb, image_size)
        image_z = model.get_image_features(pixel_values, params=params)
        return image_z / jnp.linalg.norm(image_z, axis=-1, keepdims=True)

    def loss(params, text_z, pred_rgb, key):
        """-cos(image_z, text_z), mean over batch (nerf/clip.py:37-46)."""
        image_z = encode_images(params, pred_rgb)
        return -jnp.mean(jnp.sum(image_z * text_z, axis=-1))

    return Guidance(name="clip", params=model.params,
                    get_text_embeds=get_text_embeds, loss=loss,
                    encode_images=encode_images)
