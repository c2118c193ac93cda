"""NeRF field networks (TPU-native flax.linen modules).

Rebuilds the reference's two text-to-3D backbones:
- grid backbone    (reference: nerf/network_grid.py) — tiled multiresolution
  grid encoder + 3x64 ReLU MLP -> (sigma, albedo), gaussian density blob,
  trunc_exp sigma activation, frequency-encoded 2x64 background MLP,
  finite-difference normals.
- vanilla backbone (reference: nerf/network.py:13-221) — frequency encoding +
  5-layer 128-wide ResBlock MLP (Linear -> LayerNorm -> +skip -> SiLU),
  autograd normals.

Shading (both backbones, reference: network_grid.py:117-144) is selected by an
integer code so the jitted train step can switch per iteration with
`lax.switch`: 0=albedo (no normals), 1=lambertian, 2=textureless, 3=normal.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dreamfusion_tpu.cameras import safe_normalize
from dreamfusion_tpu.ops.activation import trunc_exp
from dreamfusion_tpu.ops.encoders import freq_encode, freq_output_dim
from dreamfusion_tpu.ops.grid_encoder import GridEncoderSpec

SHADING_ALBEDO = 0
SHADING_LAMBERTIAN = 1
SHADING_TEXTURELESS = 2
SHADING_NORMAL = 3


class MLP(nn.Module):
    """Plain ReLU MLP (reference: network_grid.py:13-32). `dtype` sets the
    compute precision (bf16 under the -O preset; params stay f32)."""
    dim_out: int
    dim_hidden: int
    num_layers: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        for l in range(self.num_layers):
            last = l == self.num_layers - 1
            x = nn.Dense(self.dim_out if last else self.dim_hidden,
                         dtype=self.dtype, name=f"dense_{l}")(x)
            if not last:
                x = nn.relu(x)
        return x.astype(jnp.float32)


class ResBlock(nn.Module):
    """Linear -> LayerNorm -> +skip -> SiLU (reference: network.py:13-41)."""
    dim_out: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim_out, name="dense")(x)
        h = nn.LayerNorm(name="norm")(h)
        if x.shape[-1] != self.dim_out:
            x = nn.Dense(self.dim_out, use_bias=False, name="skip")(x)
        return nn.silu(h + x)


class ResMLP(nn.Module):
    """(num_layers-1) ResBlocks + final Linear (reference: network.py:44-67)."""
    dim_out: int
    dim_hidden: int
    num_layers: int

    @nn.compact
    def __call__(self, x):
        for l in range(self.num_layers - 1):
            x = ResBlock(self.dim_hidden, name=f"block_{l}")(x)
        return nn.Dense(self.dim_out, name="dense_out")(x)


def gaussian_blob(x: jax.Array) -> jax.Array:
    """Density blob 5*exp(-|x|^2 / (2*0.2^2)) anchoring geometry at the
    origin (reference: network_grid.py:68-74)."""
    d = jnp.sum(x * x, axis=-1)
    return 5.0 * jnp.exp(-d / (2.0 * 0.2 ** 2))


def _shade(albedo: jax.Array, normal: jax.Array, light_d: jax.Array,
           ratio: jax.Array, shading_code: jax.Array) -> jax.Array:
    """Albedo/lambertian/textureless/normal shading given precomputed normals
    (reference: network_grid.py:133-144)."""
    lambertian = ratio + (1.0 - ratio) * jnp.clip(normal @ light_d, 0.0, None)
    lam = jnp.broadcast_to(lambertian[..., None], albedo.shape)
    return jax.lax.switch(
        jnp.clip(shading_code, 0, 3),
        [lambda: albedo,                 # albedo (unshaded)
         lambda: albedo * lam,           # lambertian
         lambda: lam,                    # textureless
         lambda: (normal + 1.0) / 2.0],  # normal visualization
    )


class _BaseNeRF(nn.Module):
    """Shared density/forward/background/normal structure for both backbones.

    Subclasses define `encode(x)`, `sigma_net`, and normals strategy.
    """
    bound: float = 1.0
    bg_radius: float = 1.4
    num_layers_bg: int = 2
    hidden_dim_bg: int = 64
    compute_dtype: Any = jnp.float32   # bf16 under -O (replaces fp16+scaler)

    def common(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """x [N,3] in [-bound,bound] -> (sigma [N], albedo [N,3])."""
        h = self.encode(x)
        h = self.sigma_net(h)
        sigma = trunc_exp(h[..., 0] + gaussian_blob(x))
        albedo = nn.sigmoid(h[..., 1:4])
        return sigma, albedo

    def density(self, x: jax.Array):
        sigma, albedo = self.common(x)
        return {"sigma": sigma, "albedo": albedo}

    def init_all(self, x: jax.Array, d: jax.Array):
        """Touch every submodule so `model.init(key, x, d, method='init_all')`
        creates the full parameter tree (incl. the background net)."""
        sigma, albedo = self.common(x)
        bg = self.background(d) if self.bg_radius > 0 else None
        return sigma, albedo, bg

    def background(self, d: jax.Array) -> jax.Array:
        """Frequency-encoded 2x64 MLP on ray directions, sigmoid rgb
        (reference: network_grid.py:54-65,158-167)."""
        h = freq_encode(d, degree=6)
        h = self.bg_net(h)
        return nn.sigmoid(h)

    def normal(self, x: jax.Array) -> jax.Array:
        n = self.raw_normal(x)
        n = safe_normalize(n)
        return jnp.where(jnp.isnan(n), 0.0, n)

    def __call__(self, x: jax.Array, d: jax.Array, light_d: jax.Array,
                 ratio: jax.Array, shading_code) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Full shaded forward: (sigma, color, normal). Used for init and
        non-jit paths; the jitted trainer uses make_field_fns, which places
        the albedo/shaded `lax.cond` outside the module (linen modules can't
        host lax.cond over submodule calls without lifted transforms)."""
        sigma, albedo = self.common(x)
        normal = self.normal(x)
        color = _shade(albedo, normal, light_d, jnp.asarray(ratio, jnp.float32),
                       jnp.asarray(shading_code, jnp.int32))
        return sigma, color, normal


class NeRFGridNetwork(_BaseNeRF):
    """Grid backbone (reference: nerf/network_grid.py:35-181).

    tiledgrid encoder (L=16, C=2, log2_hashmap_size=16, desired res
    2048*bound) + MLP(3 layers, 64) -> (sigma, albedo); finite-difference
    normals with eps=1e-2.
    """
    num_layers: int = 3
    hidden_dim: int = 64
    table_bf16: bool = False    # bf16 table view for the corner gathers

    def setup(self):
        self.enc_spec = GridEncoderSpec(
            input_dim=3, num_levels=16, level_dim=2, base_resolution=16,
            log2_hashmap_size=16, desired_resolution=2048 * self.bound,
            gridtype="tiled",
            # full-precision models keep f32 scatter accumulation; only
            # bf16-compute runs may route the backward through the bf16
            # MXU matmul-scatter (mirrors the reference: fp16 atomics only
            # under AMP, gridencoder.cu __half path)
            scatter_impl=(None if self.compute_dtype == jnp.bfloat16
                          else "xla"))
        self.embeddings = self.param(
            "embeddings",
            lambda key: self.enc_spec.init(key))
        self.sigma_net = MLP(4, self.hidden_dim, self.num_layers,
                             dtype=self.compute_dtype)
        if self.bg_radius > 0:
            self.bg_net = MLP(3, self.hidden_dim_bg, self.num_layers_bg,
                              dtype=self.compute_dtype)

    def encode(self, x):
        emb = self.embeddings
        if self.table_bf16:
            # bf16 table view halves the HBM traffic of the 8-corner x L
            # gathers (the forward hot spot); params/optimizer stay f32 and
            # the trilinear blend accumulates in f32 (the CUDA reference
            # gathers/scatters the table in fp16 under AMP,
            # gridencoder/grid.py:38-39). Costs ~3% relative L2 noise on
            # table grads through trunc_exp. Train-path tables stay f32
            # (the opt-in train lever was removed r5b, unmeasurable +
            # provisional regression); the staged EVAL's bf16 view
            # (cfg.eval_table_bf16, measured +7.5% FPS) is the user.
            emb = emb.astype(jnp.bfloat16)
        return self.enc_spec(emb, x, bound=self.bound)

    def raw_normal(self, x, epsilon: float = 1e-2):
        """-grad sigma by central finite differences
        (reference: network_grid.py:90-105)."""
        def sig(p):
            s, _ = self.common(jnp.clip(p, -self.bound, self.bound))
            return s
        grads = []
        for d in range(3):
            e = jnp.zeros((1, 3)).at[0, d].set(epsilon)
            grads.append(0.5 * (sig(x + e) - sig(x - e)) / epsilon)
        return -jnp.stack(grads, axis=-1)


class NeRFVanillaNetwork(_BaseNeRF):
    """Vanilla backbone (reference: nerf/network.py:70-221):
    frequency encoding (degree 6 -> 39 dims) + 5x128 ResMLP; normals via
    autodiff of sigma (reference: network.py:135-146)."""
    num_layers: int = 5
    hidden_dim: int = 128

    def setup(self):
        self.sigma_net = ResMLP(4, self.hidden_dim, self.num_layers)  # LayerNorm path stays f32
        if self.bg_radius > 0:
            self.bg_net = MLP(3, self.hidden_dim_bg, self.num_layers_bg)

    def encode(self, x):
        return freq_encode(x, degree=6)

    def raw_normal(self, x):
        # lifted vjp: -d(sum sigma)/dx through the linen module
        # (reference: network.py:135-146 uses torch.autograd.grad)
        out, vjp_fn = nn.vjp(lambda mdl, p: mdl.common(p)[0], self, x)
        _, gx = vjp_fn(jnp.ones_like(out))
        return -gx


def make_field_fns(model: _BaseNeRF, params, bg: bool = True):
    """Bind (model, params) into the renderer's FieldFns interface.

    The albedo/shaded branch is a lax.cond over *pure applies* so the albedo
    path never evaluates normals (the reference's `if shading == 'albedo'`
    python branch, network_grid.py:123-127, made jit-compatible).
    """
    from dreamfusion_tpu.renderer import FieldFns

    common = lambda x: model.apply(params, x, method=model.common)
    normal = lambda x: model.apply(params, x, method=model.normal)

    def field(x, d, light_d, ratio, shading_code):
        ratio = jnp.asarray(ratio, jnp.float32)

        def albedo_branch(_):
            sigma, color = common(x)
            return sigma, color, jnp.zeros_like(x)

        def shaded_branch(_):
            sigma, albedo = common(x)
            n = normal(x)
            color = _shade(albedo, n, light_d, ratio,
                           jnp.asarray(shading_code, jnp.int32))
            return sigma, color, n

        if isinstance(shading_code, int):  # static dispatch when possible
            return albedo_branch(0) if shading_code == SHADING_ALBEDO else shaded_branch(0)
        return jax.lax.cond(shading_code == SHADING_ALBEDO,
                            albedo_branch, shaded_branch, 0)

    density = lambda x: model.apply(params, x, method=model.density)
    background = None
    if bg and model.bg_radius > 0:
        background = lambda d: model.apply(params, d, method=model.background)
    return FieldFns(field=field, density=density, background=background,
                    normal=normal)


def build_model(cfg) -> _BaseNeRF:
    """Backbone dispatch (reference: main.py:86-94 + the Kailu editing path
    main.py:100-102 via backbone='dvgo')."""
    dtype = jnp.bfloat16 if cfg.fp16 else jnp.float32
    if cfg.backbone == "grid":
        return NeRFGridNetwork(bound=cfg.bound, bg_radius=cfg.bg_radius,
                               compute_dtype=dtype)
    if cfg.backbone == "vanilla":
        return NeRFVanillaNetwork(bound=cfg.bound, bg_radius=cfg.bg_radius,
                                  compute_dtype=dtype)
    if cfg.backbone == "dvgo":
        from dreamfusion_tpu.models.kailu import DVGOEditNetwork

        return DVGOEditNetwork.from_config(cfg)
    raise NotImplementedError(f"backbone {cfg.backbone!r} not implemented "
                              "(choose from grid, vanilla, dvgo)")
