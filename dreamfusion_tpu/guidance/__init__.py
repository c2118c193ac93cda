"""Guidance models driving the NeRF appearance.

Rebuilds the reference's guidance layer (nerf/sd.py, nerf/clip.py) with a
uniform pure-function interface so the whole step jits:

  guidance.get_text_embeds(prompts, negatives) -> text_z   (host-side, once)
  guidance.loss(params, text_z, pred_rgb_bhwc, key) -> scalar  (jit-safe)

The reference's two-phase SDS backward (latents.backward(gradient=w*(e-eps)),
nerf/sd.py:115) is re-expressed as a single scalar loss whose gradient is
identical — see guidance/sds.py.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp


class Guidance(NamedTuple):
    name: str
    params: Any                      # frozen pytree passed through the jitted step
    get_text_embeds: Callable        # (prompts, negatives) -> text_z
    loss: Callable                   # (params, text_z, pred_rgb [B,H,W,3], key) -> scalar
    encode_images: Any = None        # optional: (params, [B,H,W,3]) -> features
                                     # (used by the CLIP-R-precision metric)


def none_guidance() -> Guidance:
    """No guidance — regularizers only (used for smoke tests and
    geometry-only runs)."""
    return Guidance(
        name="none",
        params={},
        get_text_embeds=lambda prompts, negatives: jnp.zeros((len(prompts), 1)),
        loss=lambda params, text_z, pred_rgb, key: jnp.float32(0.0),
    )


def build_guidance(cfg) -> Guidance:
    """Dispatch like main.py:134-141."""
    if cfg.guidance == "none" or cfg.text is None:
        return none_guidance()
    if cfg.guidance == "clip":
        from dreamfusion_tpu.guidance.clip import build_clip_guidance

        return build_clip_guidance(cfg.clip_weights)
    if cfg.guidance == "stable-diffusion":
        import jax.numpy as _jnp

        from dreamfusion_tpu.guidance.sd import build_sd_guidance

        sd_w = cfg.sd_weights
        if sd_w in (None, "random-full"):
            # zero-egress env: weights can only arrive as a mount. Probe +
            # log every startup so the flip to real weights is automatic
            # the day they appear (random-tiny stays tiny: test configs).
            from dreamfusion_tpu.guidance.sd.probe import find_sd_weights

            real = find_sd_weights()
            if real is not None:
                sd_w = real
        return build_sd_guidance(
            sd_w, guidance_scale=cfg.guidance_scale,
            dtype=_jnp.bfloat16 if cfg.fp16 else _jnp.float32)
    raise NotImplementedError(f"guidance {cfg.guidance!r} not implemented")
