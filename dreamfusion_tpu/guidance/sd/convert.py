"""Convert torch (diffusers-layout) Stable Diffusion weights to our flax trees.

Usage:
    python -m dreamfusion_tpu.guidance.sd.convert /path/to/sd15 out.msgpack

The module/parameter names in unet.py / vae.py mirror the diffusers
state_dict structure, so conversion is a mechanical rename + layout
transpose: Linear [O,I] -> kernel [I,O]; Conv OIHW -> HWIO; norm weight ->
scale. Matching is done on separator-normalized names so the flax nesting
boundaries don't have to line up with the torch dots.

The text encoder (CLIP ViT-L, nerf/sd.py:42-43) loads through transformers'
flax classes directly from the same checkpoint directory.
"""

from __future__ import annotations

import os
import re
from typing import Any, Callable, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

_ALIASES = {  # old diffusers VAE attention names
    "query": "to_q", "key": "to_k", "value": "to_v", "proj_attn": "to_out_0",
}


def _norm(name: str) -> str:
    for old, new in _ALIASES.items():
        name = re.sub(rf"(^|\.){old}(\.|$)", rf"\1{new}\2", name)
    return re.sub(r"[^0-9a-zA-Z]", "", name).lower()


def _flatten(tree, prefix=()) -> Dict[tuple, Any]:
    out = {}
    if isinstance(tree, dict) or hasattr(tree, "items"):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out[prefix] = tree
    return out


def _unflatten(flat: Dict[tuple, Any]):
    tree: Dict[str, Any] = {}
    for path, v in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return tree


def convert_state_dict(torch_sd: Dict[str, "np.ndarray"], flax_params) -> Any:
    """Map a torch state_dict (name -> numpy array) onto the structure of
    `flax_params` (the randomly-initialized template). Raises on any
    unmatched or shape-incompatible parameter."""
    flat = _flatten(flax_params)
    lookup = {}
    for path in flat:
        # drop flax's top-level 'params' collection key from the match key
        mpath = path[1:] if path and path[0] == "params" else path
        lookup["".join(_norm(p) for p in mpath)] = path

    new_flat = dict(flat)
    matched = set()
    skipped = []
    for name, w in torch_sd.items():
        w = np.asarray(w, dtype=np.float32)
        base, leaf = name.rsplit(".", 1)
        if leaf == "weight":
            candidates = ["kernel", "scale"]
        elif leaf == "bias":
            candidates = ["bias"]
        else:
            skipped.append(name)
            continue
        path = None
        for cand in candidates:
            key = _norm(base) + cand
            if key in lookup:
                path = lookup[key]
                break
        if path is None:
            skipped.append(name)
            continue
        target = flat[path]
        if path[-1] == "kernel":
            if w.ndim == 4:
                # old VAE attn convs are 1x1 convs feeding our Dense
                if target.ndim == 2:
                    w = w[:, :, 0, 0].T
                else:
                    w = w.transpose(2, 3, 1, 0)
            elif w.ndim == 2:
                w = w.T
        if tuple(w.shape) != tuple(np.shape(target)):
            raise ValueError(f"{name}: shape {w.shape} vs flax "
                             f"{np.shape(target)} at {'/'.join(path)}")
        new_flat[path] = jnp.asarray(w)
        matched.add(path)
    missing = [p for p in flat if p not in matched]
    if missing:
        raise ValueError(f"{len(missing)} flax params not found in torch "
                         f"checkpoint, e.g. {missing[:5]}")
    return _unflatten(new_flat), skipped


def _load_torch_dir(path: str) -> Dict[str, np.ndarray]:
    """Load a diffusers-format module dir (safetensors or torch .bin)."""
    for fname in ("diffusion_pytorch_model.safetensors",
                  "model.safetensors"):
        f = os.path.join(path, fname)
        if os.path.exists(f):
            from safetensors import safe_open

            out = {}
            with safe_open(f, framework="np") as sf:
                for k in sf.keys():
                    out[k] = sf.get_tensor(k)
            return out
    for fname in ("diffusion_pytorch_model.bin", "pytorch_model.bin"):
        f = os.path.join(path, fname)
        if os.path.exists(f):
            import torch

            sd = torch.load(f, map_location="cpu", weights_only=True)
            return {k: v.numpy() for k, v in sd.items()}
    raise FileNotFoundError(f"no model weights found under {path}")


def load_sd_params(sd_dir: str, unet, vae) -> Tuple[Dict[str, Any], Callable]:
    """Load a diffusers-layout SD directory -> ({'unet','vae'} params,
    text_encode fn)."""
    import jax

    key = jax.random.PRNGKey(0)
    lat = jnp.zeros((1, 64, 64, 4))
    img = jnp.zeros((1, 512, 512, 3))
    ctx = jnp.zeros((1, 77, unet.cross_attention_dim))
    unet_tpl = jax.eval_shape(lambda: unet.init(key, lat, jnp.zeros((1,), jnp.int32), ctx))
    vae_tpl = jax.eval_shape(lambda: vae.init(key, img, key))
    unet_tpl = jax.tree.map(lambda s: np.zeros(s.shape, np.float32), unet_tpl)
    vae_tpl = jax.tree.map(lambda s: np.zeros(s.shape, np.float32), vae_tpl)

    unet_params, _ = convert_state_dict(
        _load_torch_dir(os.path.join(sd_dir, "unet")), unet_tpl)
    vae_params, _ = convert_state_dict(
        _load_torch_dir(os.path.join(sd_dir, "vae")), vae_tpl)
    params = {"unet": unet_params, "vae": vae_params}

    from transformers import CLIPTokenizer, FlaxCLIPTextModel

    text_model = FlaxCLIPTextModel.from_pretrained(
        os.path.join(sd_dir, "text_encoder"), from_pt=True)
    tokenizer = CLIPTokenizer.from_pretrained(os.path.join(sd_dir, "tokenizer"))

    def text_encode(prompts):
        ids = tokenizer(prompts, padding="max_length", max_length=77,
                        truncation=True, return_tensors="np").input_ids
        return text_model(ids)[0]

    return params, text_encode


if __name__ == "__main__":
    import argparse
    import pickle

    ap = argparse.ArgumentParser()
    ap.add_argument("sd_dir", help="diffusers-format SD v1.5 directory")
    ap.add_argument("out", help="output pickle of flax params")
    args = ap.parse_args()

    from dreamfusion_tpu.guidance.sd.unet import sd15_unet
    from dreamfusion_tpu.guidance.sd.vae import sd15_vae

    params, _ = load_sd_params(args.sd_dir, sd15_unet(), sd15_vae())
    with open(args.out, "wb") as f:
        pickle.dump(jax.tree.map(np.asarray, params), f)
    print(f"wrote {args.out}")
