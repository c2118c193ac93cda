"""Single-scene editing bridge: frozen DVGO geometry + SDS-tunable color MLP.

Rebuilds NeRFNetwork_Kailu (reference: nerf/network.py:224-312) — the fork's
own use case: load a pretrained DVGO fine model, freeze its density and k0
grids, and fine-tune only the color MLP (rgbnet) under text guidance.

Behavioral parity:
- coordinate remap world -> DVGO space: y/z swap + 1.25 scale about the bbox
  center (network.py:245-249)
- sigma = softplus(density + act_shift) * 10 on the frozen grid
  (network.py:260), zero outside the bbox
- albedo = rgbnet(k0 features, PE) queried with the fixed view direction
  1/sqrt(3) (network.py:265-266); 0.5 outside the bbox
- trainable params: rgbnet (+ background net) only (network.py:270-283) —
  expressed here as `frozen_prefixes` consumed by the optimizer's
  multi_transform labels (optax.set_to_zero for frozen groups)
- the monkey-patched differentiable grid sampler (network.py:232-233) is
  simply our ops.grid_sample_3d, which is differentiable by construction.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dreamfusion_tpu.models.dvgo import DVGOField
from dreamfusion_tpu.models.networks import _BaseNeRF, MLP


class DVGOEditNetwork(_BaseNeRF):
    """_BaseNeRF-compatible wrapper: works with the DreamFusion Trainer and
    both renderer paths."""
    world_size: Tuple[int, int, int] = (96, 96, 96)
    k0_dim: int = 12
    rgbnet_name: str = "resmlp"
    rgbnet_width: int = 128
    rgbnet_depth: int = 3
    posbase_pe: int = 5
    viewbase_pe: int = 4
    xyz_min: Tuple[float, float, float] = (-1.0, -1.0, -1.0)
    xyz_max: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    alpha_init: float = 1e-6
    stepsize: float = 0.5
    voxel_size_ratio: float = 1.0

    # optimizer: freeze the geometry/feature grids (network.py:271-273)
    frozen_prefixes = ("main/density", "main/k0")

    def setup(self):
        self.main = DVGOField(
            world_size=self.world_size, k0_dim=self.k0_dim,
            rgbnet_name=self.rgbnet_name, rgbnet_width=self.rgbnet_width,
            rgbnet_depth=self.rgbnet_depth, posbase_pe=self.posbase_pe,
            viewbase_pe=self.viewbase_pe, xyz_min=self.xyz_min,
            xyz_max=self.xyz_max, alpha_init=self.alpha_init,
            stepsize=self.stepsize, voxel_size_ratio=self.voxel_size_ratio)
        if self.bg_radius > 0:
            self.bg_net = MLP(3, self.hidden_dim_bg, self.num_layers_bg)

    def to_our_coor(self, x: jax.Array) -> jax.Array:
        """world [-bound, bound] -> DVGO scene coords (network.py:245-249)."""
        scaled = ((x + self.bound) / (2.0 * self.bound))[..., jnp.array([0, 2, 1])]
        scaled = (scaled - 0.5) * 1.25 + 0.5
        return scaled * (self.main.maxs - self.main.mins) + self.main.mins

    def common(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        pts = self.to_our_coor(x)
        inside = jnp.all((pts <= self.main.maxs) & (pts >= self.main.mins), -1)
        pts_safe = jnp.clip(pts, self.main.mins, self.main.maxs)
        density = jnp.where(inside, self.main.sample_density(pts_safe), 0.0)
        sigma = jax.nn.softplus(density + self.main.act_shift) * 10.0
        vd = jnp.ones_like(pts) / jnp.sqrt(3.0)  # fixed viewdir (network.py:265)
        albedo = jnp.where(inside[..., None],
                           self.main.query_rgb(pts_safe, vd), 0.5)
        return sigma, albedo

    def raw_normal(self, x):
        # autograd normal like the vanilla backbone (network.py:135-146),
        # through the frozen density grid
        out, vjp_fn = nn.vjp(lambda mdl, p: mdl.common(p)[0], self, x)
        _, gx = vjp_fn(jnp.ones_like(out))
        return -gx

    @classmethod
    def from_config(cls, cfg):
        kw: Dict[str, Any] = dict(bound=cfg.bound, bg_radius=cfg.bg_radius)
        if cfg.pretrained_dvgo:
            meta = peek_dvgo_checkpoint(cfg.pretrained_dvgo)
            kw.update(meta)
        return cls(**kw)

    def load_pretrained(self, params, path: str):
        """Fill density/k0/rgbnet from a torch-lightning .dvgo checkpoint
        (the files produced by pipeline 3 / frameworks, consumed at
        main.py:101-102)."""
        return load_dvgo_state_into_params(params, path, scope="main")


# ---------------------------------------------------------------------------
# torch .dvgo checkpoint interop
# ---------------------------------------------------------------------------

def _read_dvgo_ckpt(path: str):
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("state_dict", ckpt)
    hparams = ckpt.get("hyper_parameters", {})
    return state, hparams


def peek_dvgo_checkpoint(path: str) -> Dict[str, Any]:
    """Extract module-construction metadata from a .dvgo lightning ckpt."""
    state, hparams = _read_dvgo_ckpt(path)
    density = state["density"]
    k0 = state["k0"]
    meta: Dict[str, Any] = {
        "world_size": tuple(int(s) for s in density.shape[-3:]),
        "k0_dim": int(k0.shape[-4]),
        "xyz_min": tuple(float(v) for v in state["xyz_min"]),
        "xyz_max": tuple(float(v) for v in state["xyz_max"]),
        "voxel_size_ratio": float(state.get("voxel_size_ratio", 1.0)),
    }
    try:
        cfg = hparams["params"]["cfg"]["fine_model_and_render"]
        meta.update(
            rgbnet_name=cfg.get("rgbnet", "resmlp"),
            rgbnet_width=int(cfg.get("rgbnet_width", 128)),
            rgbnet_depth=int(cfg.get("rgbnet_depth", 3)),
            posbase_pe=int(cfg.get("posbase_pe", 5)),
            viewbase_pe=int(cfg.get("viewbase_pe", 4)),
            alpha_init=float(cfg.get("alpha_init", 1e-6)),
            stepsize=float(cfg.get("stepsize", 0.5)),
        )
    except (KeyError, TypeError):
        pass
    return meta


def load_dvgo_state_into_params(params, path: str, scope: str = "main"):
    """Copy grids + rgbnet weights from the torch state dict into the flax
    tree. rgbnet torch names (net.0 / net.2.net / net.-1) map onto our
    decoder module names (dense_in / res_i/net / dense_out)."""
    state, _ = _read_dvgo_ckpt(path)
    p = jax.tree.map(lambda x: x, params)  # shallow copy
    tgt = p["params"][scope]
    tgt["density"] = jnp.asarray(np.asarray(state["density"])[0])
    tgt["k0"] = jnp.asarray(np.asarray(state["k0"])[0])

    rgb_keys = sorted(k for k in state if k.startswith("rgbnet."))
    if rgb_keys and "rgbnet" in tgt:
        flax_rgb = tgt["rgbnet"]

        def put(dst: Dict, names, w, b):
            node = flax_rgb
            for n in names[:-1]:
                node = node[n]
            node[names[-1]]["kernel"] = jnp.asarray(np.asarray(w).T)
            node[names[-1]]["bias"] = jnp.asarray(np.asarray(b))

        # torch Sequential: net.0 (in), net.2..net.(2+depth-3) residual or
        # hidden, net.-1 (out). Gather (weight, bias) pairs in order.
        import re

        layers = {}
        for k in rgb_keys:
            m = re.match(r"rgbnet\.net\.(\d+)(?:\.net)?\.(weight|bias)", k)
            if m:
                layers.setdefault(int(m.group(1)), {})[m.group(2)] = state[k]
        idxs = sorted(layers)
        names_in_order = (["dense_in"]
                          + [f"res_{i}" for i in range(len(idxs) - 2)]
                          + ["dense_out"])
        if "dense_in" not in flax_rgb:  # BasicMLP naming
            names_in_order = ([f"dense_{i}" for i in range(len(idxs) - 1)]
                              + ["dense_out"])
        for name, idx in zip(names_in_order, idxs):
            w, b = layers[idx]["weight"], layers[idx]["bias"]
            if name.startswith("res_"):
                put(flax_rgb, [name, "net"], w, b)
            else:
                put(flax_rgb, [name], w, b)
    return p
