"""DVGO pretraining pipeline (pipeline 3): coarse -> fine voxel-grid training.

Rebuilds the reference's lightning-based stack as jitted JAX loops:
- frameworks/nerf/train_nerf_models.py — the two-stage driver: coarse bbox
  from camera frustums -> coarse fit -> fine bbox from coarse geometry +
  MaskCache -> fine fit -> test render/PSNR/video.
- frameworks/nerf/modules/lightning_base.py — optimizer/scheduler factory and
  PSNR metric.
- frameworks/nerf/utils.py Adam.set_pervoxel_lr — per-voxel LR scaling from
  view counts, expressed here as an optax update-scaling transform.
- progressive grid scaling at pg_scale epochs (dvgo_coarse.py:150-188):
  trilinear re-interp + optimizer re-init.

Checkpoints are written with torch.save in the lightning state_dict layout,
so the produced .dvgo files are interchangeable with the reference's and
feed the editing bridge (models/kailu.py) directly.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dreamfusion_tpu.models.dvgo import (DVGOField, MaskCacheData, dvgo_losses,
                                         scale_volume_grid)


def psnr(pred: jax.Array, target: jax.Array) -> jax.Array:
    mse = jnp.mean((pred - target) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-10))


def compute_bbox_by_cam_frustrm(data_dict: Dict, cfg_data: Dict) -> Tuple:
    """Tight bbox over all train-view frusta at [near, far]
    (modules/utils.py:83-97)."""
    from dreamfusion_tpu.datasets.rays import get_rays_of_a_view

    HW, Ks, poses = data_dict["HW"], data_dict["Ks"], data_dict["poses"]
    near, far = data_dict["near"], data_dict["far"]
    lo = np.full(3, np.inf)
    hi = -lo
    for i in np.asarray(data_dict["i_train"]):
        H, W = int(HW[i][0]), int(HW[i][1])
        ro, rd, vd = get_rays_of_a_view(H, W, Ks[i], poses[i], **{
            k: v for k, v in cfg_data.items()
            if k in ("ndc", "inverse_y", "flip_x", "flip_y", "mode", "img_type")})
        pts = np.stack([ro + vd * near, ro + vd * far])
        lo = np.minimum(lo, pts.reshape(-1, 3).min(0))
        hi = np.maximum(hi, pts.reshape(-1, 3).max(0))
    return tuple(lo.tolist()), tuple(hi.tolist())


def compute_bbox_by_coarse_geo(field: DVGOField, params, thres: float) -> Tuple:
    """Bbox of coarse cells whose alpha exceeds thres (modules/utils.py:100-116)."""
    X, Y, Z = field.world_size
    lin = [np.linspace(0, 1, s) for s in (X, Y, Z)]
    gx, gy, gz = np.meshgrid(*lin, indexing="ij")
    interp = jnp.asarray(np.stack([gx, gy, gz], -1).reshape(-1, 3), jnp.float32)
    xyz = field.mins * (1 - interp) + field.maxs * interp
    dens = field.apply(params, xyz, method=field.sample_density)
    alpha = field.apply(params, dens, method=field.activate_density)
    mask = np.asarray(alpha > thres)
    active = np.asarray(xyz)[mask]
    assert active.size > 0, "no active cells above threshold"
    return tuple(active.min(0).tolist()), tuple(active.max(0).tolist())


def world_size_for(xyz_min, xyz_max, num_voxels: int) -> Tuple[int, int, int]:
    """(dvgo_coarse.py:54-66)"""
    ext = np.array(xyz_max) - np.array(xyz_min)
    voxel_size = (ext.prod() / num_voxels) ** (1 / 3)
    ws = np.maximum((ext / voxel_size).astype(int), 1)
    return tuple(int(x) for x in ws)


def scale_update_by_factors(factors_tree) -> optax.GradientTransformation:
    """Per-parameter multiplicative update scaling — the per-voxel LR
    (frameworks/nerf/utils.py:19-163). factors_tree matches params structure
    with arrays or None."""

    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        def scale(u, f):
            return u if f is None else u * f
        return jax.tree.map(scale, updates, factors_tree,
                            is_leaf=lambda x: x is None), state

    return optax.GradientTransformation(init, update)


@dataclass
class DVGOStageConfig:
    """One training stage (coarse_train / fine_train in the mmcv configs)."""
    n_iters: int = 5000
    lr_density: float = 1e-1
    lr_k0: float = 1e-1
    lr_rgbnet: float = 1e-3
    lrate_decay: int = 20            # exp decay to 0.1 over decay*1000 steps
    batch_size: int = 8192
    weight_main: float = 1.0
    weight_entropy_last: float = 0.01
    weight_rgbper: float = 0.1
    entropy_weight: float = 0.0
    weight_tv_density: float = 0.0
    weight_tv_k0: float = 0.0
    pg_scale: Tuple[int, ...] = ()   # iterations at which to double voxels


def _make_optimizer(stage: DVGOStageConfig, params,
                    pervoxel_factors=None) -> optax.GradientTransformation:
    """Per-group Adam with exponential decay, lr<=0 freezes the group
    (create_optimizer_or_freeze_model, frameworks/nerf/utils.py:166-190)."""
    decay_steps = stage.lrate_decay * 1000

    def sched(base):
        return lambda step: base * (0.1 ** (step / decay_steps))

    def group(base):
        if base <= 0:
            return optax.set_to_zero()
        return optax.adam(sched(base))

    def label(path_tuple):
        names = [str(getattr(k, "key", k)) for k in path_tuple]
        if "density" in names:
            return "density"
        if "k0" in names:
            return "k0"
        return "rgbnet"

    labels = jax.tree_util.tree_map_with_path(lambda p, _: label(p), params)
    tx = optax.multi_transform(
        {"density": group(stage.lr_density), "k0": group(stage.lr_k0),
         "rgbnet": group(stage.lr_rgbnet)}, labels)
    if pervoxel_factors is not None:
        tx = optax.chain(tx, scale_update_by_factors(pervoxel_factors))
    return tx


class DVGOTrainer:
    """Train one DVGO field on a ray dataset (one lightning 'fit' analog)."""

    def __init__(self, field: DVGOField, stage: DVGOStageConfig, *,
                 near: float, far: float, bg=(1.0, 1.0, 1.0), seed: int = 0,
                 pervoxel_factors=None, tv_every: int = 1):
        self.field = field
        self.stage = stage
        self.near = near
        self.far = far
        self.bg = jnp.asarray(bg, jnp.float32)
        self.key = jax.random.PRNGKey(seed)
        self.n_samples = field.n_render_samples(far)

        self.key, k = jax.random.split(self.key)
        o = jnp.zeros((4, 3))
        d = jnp.tile(jnp.array([[0.0, 0, 1.0]]), (4, 1))
        self.params = field.init(k, o, d, d, near=near, far=far, bg=self.bg,
                                 n_samples=self.n_samples, method=field.render)
        self.pervoxel_factors = pervoxel_factors
        self.tx = _make_optimizer(stage, self.params, pervoxel_factors)
        self.opt_state = self.tx.init(self.params)
        self._step_fn = self._build_step()
        self.global_step = 0

    def _build_step(self):
        field, stage = self.field, self.stage
        near, far, bg, n_samples = self.near, self.far, self.bg, self.n_samples

        def step(params, opt_state, batch, key):
            rays_d, rays_o, viewdirs, target = batch

            def loss_fn(p):
                out = field.apply(p, rays_o, rays_d, viewdirs, near=near,
                                  far=far, bg=bg, n_samples=n_samples,
                                  key=key, method=field.render)
                loss, logs = dvgo_losses(
                    out, target, weight_main=stage.weight_main,
                    weight_entropy_last=stage.weight_entropy_last,
                    weight_rgbper=stage.weight_rgbper,
                    entropy_weight=stage.entropy_weight)
                if stage.weight_tv_density > 0:
                    from dreamfusion_tpu.models.dvgo import total_variation

                    act = field.apply(
                        p, p["params"]["density"],
                        method=field.activate_density)
                    loss = loss + stage.weight_tv_density * total_variation(act)
                if stage.weight_tv_k0 > 0:
                    from dreamfusion_tpu.models.dvgo import total_variation

                    loss = loss + stage.weight_tv_k0 * total_variation(
                        p["params"]["k0"])
                logs["psnr"] = psnr(out["rgb_marched"], target)
                # per-ray sq error for error-map samplers (nerf/utils.py:73-83)
                logs["per_ray_err"] = jnp.mean(
                    (out["rgb_marched"] - target[..., :3]) ** 2, axis=-1)
                return loss, logs

            (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            logs["loss"] = loss
            return params, opt_state, logs

        return jax.jit(step, donate_argnums=(0, 1))

    def maybe_pg_scale(self, it: int, num_voxels_base: int):
        """Progressive voxel scaling (dvgo_coarse.py:150-188): at each
        pg_scale milestone the voxel count doubles (cumulatively)."""
        if it not in self.stage.pg_scale:
            return
        factor = 2 ** (list(self.stage.pg_scale).index(it) + 1)
        new_ws = world_size_for(self.field.xyz_min, self.field.xyz_max,
                                num_voxels_base * factor)
        self.params = scale_volume_grid(self.params, new_ws)
        self.field = self.field.copy(world_size=new_ws)
        self.n_samples = self.field.n_render_samples(self.far)
        self.tx = _make_optimizer(self.stage, self.params, None)
        self.opt_state = self.tx.init(self.params)
        self._step_fn = self._build_step()

    def fit(self, train_loader, num_voxels_base: Optional[int] = None,
            log_every: int = 500, log_fn: Optional[Callable] = None):
        it = 0
        while it < self.stage.n_iters:
            for batch in train_loader:
                if it >= self.stage.n_iters:
                    break
                if num_voxels_base:
                    self.maybe_pg_scale(it, num_voxels_base)
                self.key, k = jax.random.split(self.key)
                batch = tuple(jnp.asarray(b) for b in batch)
                self.params, self.opt_state, logs = self._step_fn(
                    self.params, self.opt_state, batch, k)
                per_ray_err = logs.pop("per_ray_err", None)
                if per_ray_err is not None and hasattr(train_loader,
                                                       "update_last"):
                    train_loader.update_last(per_ray_err)
                if log_fn and (it % log_every == 0 or it == self.stage.n_iters - 1):
                    log_fn(it, {k_: float(v) for k_, v in logs.items()})
                it += 1
        self.global_step = it
        return self.params

    def evaluate(self, loader, max_batches: Optional[int] = None) -> float:
        """Mean PSNR over a ray loader (validation/psnr analog)."""
        total, n = 0.0, 0
        render = jax.jit(lambda p, ro, rd, vd: self.field.apply(
            p, ro, rd, vd, near=self.near, far=self.far, bg=self.bg,
            n_samples=self.n_samples, method=self.field.render)["rgb_marched"])
        for i, batch in enumerate(loader):
            if max_batches and i >= max_batches:
                break
            rays_d, rays_o, viewdirs, target = (jnp.asarray(b) for b in batch)
            pred = render(self.params, rays_o, rays_d, viewdirs)
            total += float(psnr(pred, target))
            n += 1
        return total / max(n, 1)

    # -- checkpoint interop (.dvgo lightning layout) ---------------------------------

    def save_dvgo(self, path: str, cfg_dict: Optional[Dict] = None):
        import torch

        f = self.field
        p = self.params["params"]
        state = {
            "density": torch.from_numpy(np.asarray(p["density"]).copy())[None],
            "k0": torch.from_numpy(np.asarray(p["k0"]).copy())[None],
            "xyz_min": torch.tensor(list(f.xyz_min), dtype=torch.float32),
            "xyz_max": torch.tensor(list(f.xyz_max), dtype=torch.float32),
            "voxel_size_ratio": torch.tensor(float(f.voxel_size_ratio)),
            "world_size": torch.tensor(list(f.world_size)),
        }
        if "rgbnet" in p:
            _export_rgbnet_torch(state, p["rgbnet"])
        ckpt = {"state_dict": state,
                "hyper_parameters": {"params": {"cfg": cfg_dict or {
                    "fine_model_and_render": {
                        "rgbnet": f.rgbnet_name or "resmlp",
                        "rgbnet_width": f.rgbnet_width,
                        "rgbnet_depth": f.rgbnet_depth,
                        "posbase_pe": f.posbase_pe,
                        "viewbase_pe": f.viewbase_pe,
                        "alpha_init": f.alpha_init,
                        "stepsize": f.stepsize,
                    }}}}}
        torch.save(ckpt, path)
        return path


def _export_rgbnet_torch(state: Dict, rgb: Dict):
    """Inverse of models.kailu.load_dvgo_state_into_params for ResMLP /
    BasicMLP: flax names -> torch Sequential indices."""
    import torch

    def put(idx, node):
        state[f"rgbnet.net.{idx}.weight"] = torch.from_numpy(
            np.asarray(node["kernel"]).T.copy())
        state[f"rgbnet.net.{idx}.bias"] = torch.from_numpy(
            np.asarray(node["bias"]).copy())

    if "dense_in" in rgb:  # ResMLP: [0]=in, [2..]=res blocks, last=out
        put(0, rgb["dense_in"])
        res = sorted(k for k in rgb if k.startswith("res_"))
        for i, name in enumerate(res):
            state[f"rgbnet.net.{2 + i}.net.weight"] = torch.from_numpy(
                np.asarray(rgb[name]["net"]["kernel"]).T.copy())
            state[f"rgbnet.net.{2 + i}.net.bias"] = torch.from_numpy(
                np.asarray(rgb[name]["net"]["bias"]).copy())
        put(2 + len(res), rgb["dense_out"])
    else:  # BasicMLP: dense_0.. + dense_out at torch indices 0,2,4,...
        hidden = sorted(k for k in rgb if k.startswith("dense_") and k != "dense_out")
        for i, name in enumerate(hidden):
            put(2 * i, rgb[name])
        put(2 * len(hidden), rgb["dense_out"])


def voxel_count_views(field: DVGOField, params, data_dict: Dict,
                      cfg_data: Dict, stepsize: float,
                      downrate: int = 1) -> np.ndarray:
    """Per-voxel view-coverage count driving per-voxel LR
    (dvgo_coarse.py:104-148): for each train view, march rays and count grid
    touches — computed here via the autodiff trick the reference uses
    (gradient of sum of sampled ones w.r.t. a ones-grid)."""
    from dreamfusion_tpu.datasets.rays import get_rays_of_a_view
    from dreamfusion_tpu.ops.grid_sample import grid_sample_3d

    ones = jnp.ones((1,) + tuple(field.world_size))
    count = np.zeros(ones.shape, np.float32)
    n_samples = field.n_render_samples(data_dict["far"])
    HW, Ks, poses = data_dict["HW"], data_dict["Ks"], data_dict["poses"]

    @jax.jit
    def touch(ro, rd):
        from dreamfusion_tpu.models.dvgo import sample_ray

        pts, oob = sample_ray(ro, rd, near=data_dict["near"],
                              far=data_dict["far"], xyz_min=field.mins,
                              xyz_max=field.maxs, voxel_size=field.voxel_size,
                              stepsize=stepsize, n_samples=n_samples)
        x01 = (pts - field.mins) / (field.maxs - field.mins)

        def s(g):
            vals = grid_sample_3d(g, jnp.clip(x01.reshape(-1, 3), 0, 1))
            return jnp.sum(jnp.where(oob.reshape(-1, 1), 0.0, vals))

        return jax.grad(s)(ones)

    for i in np.asarray(data_dict["i_train"]):
        H, W = int(HW[i][0]), int(HW[i][1])
        ro, rd, vd = get_rays_of_a_view(H, W, Ks[i], poses[i], **{
            k: v for k, v in cfg_data.items()
            if k in ("ndc", "inverse_y", "flip_x", "flip_y", "mode", "img_type")})
        ro = ro[::downrate, ::downrate].reshape(-1, 3)
        rd = rd[::downrate, ::downrate].reshape(-1, 3)
        g = touch(jnp.asarray(ro), jnp.asarray(rd))
        count += np.asarray(g > 2) * 2
    return count
