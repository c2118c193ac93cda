"""Configuration for dreamfusion_tpu.

One dataclass replaces the reference's argparse namespace (reference:
main.py:12-73). The ``-O`` / ``-O2`` presets are preserved (main.py:75-84):
``-O``  = mixed precision + occupancy-grid raymarching + view-dependent text,
``-O2`` = mixed precision + view-dependent text (dense stratified renderer).

On TPU, "fp16 + GradScaler" becomes plain bf16 compute (no scaler needed),
and "cuda_ray" becomes the occupancy-grid renderer (renderer path B).
"""

from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass, field
from typing import List, Optional, Tuple


@dataclass
class Config:
    # -- experiment ---------------------------------------------------------
    text: Optional[str] = None          # text prompt
    negative: str = ""                  # negative text prompt
    workspace: str = "workspace"
    seed: int = 0
    test: bool = False                  # test mode (no training)
    gui: bool = False                   # interactive dearpygui viewer
                                        # (reference: main.py:64,113-115)
    save_mesh: bool = False             # export textured mesh after test
    eval_interval: int = 10             # eval every N epochs
    guidance: str = "stable-diffusion"  # 'stable-diffusion' | 'clip' | 'none'
    ckpt: str = "latest"                # latest | best | scratch | <path>

    # -- training -----------------------------------------------------------
    iters: int = 10000
    lr: float = 1e-3
    batch_size: int = 1                 # cameras per step (reference is 1; TPU batches)
    grid_ray: bool = False              # occupancy-grid renderer ("cuda_ray" analog)
    max_steps: int = 512                # max marching steps/ray (grid_ray)
    num_steps: int = 64                 # coarse samples/ray (stratified renderer)
    upsample_steps: int = 64            # importance samples/ray (stratified renderer)
    update_extra_interval: int = 16     # occupancy grid refresh interval
    max_ray_batch: int = 4096           # inference ray chunk ("staged" rendering)
    albedo_iters: int = 1000            # albedo-only shading warmup
    uniform_sphere_rate: float = 0.5
    grid_K: int = 128
    # adapt the per-ray sample budget to occupancy (bucketed K <= grid_K,
    # the mean_count-budget analog of raymarching.py:200-231)
    grid_K_adaptive: bool = True                   # compacted samples/ray kept for the field
                                        # query in the grid_ray train path (TPU
                                        # static-shape analog of mean_count)
    grid_size: int = 128                # occupancy grid resolution per cascade
    # fused Pallas compositing kernel in the grid renderer. None = auto:
    # Pallas on TPU (measured: render grads 174.2 ms vs 177.2 ms jnp on
    # v5e, max output diff 1.7e-5), jnp cumprod elsewhere (the interpret-
    # mode kernel would slow CPU runs ~10x).
    pallas_composite: Optional[bool] = None
    # (--grid_table_bf16, the TRAIN-path bf16 hash-table lever, was removed
    # r5b after five failed measurement slots across rounds 2-5: its step
    # program alone compiles >25 min remotely, and its only surviving
    # evidence — the compile-safe provisional window, 5.372 vs 5.729 it/s —
    # shows a regression. The model capability (table_bf16) stays: the
    # staged eval's bf16 view below uses it, measured +7.5% FPS.)
    #
    # staged-EVAL-only bf16 hash-table view: halves the bytes of the shade
    # stage's level gathers without touching the train step. Measured
    # (r5b, 800^2 ball): 1.5193 FPS bf16 vs 1.4126 f32. Parity note: the
    # reference renders eval frames under torch.cuda.amp fp16 (utils.py
    # eval loop), so bf16 eval features are the reference's own numeric
    # regime, not a loosened one.
    eval_table_bf16: bool = True
    # adaptive-K bucket source: 'count' = 95th-pct marching count (the
    # mean_count budget analog); 'live' = 95th-pct TRANSMITTANCE-live count
    # (samples before the T<1e-4 early stop — the CUDA compositor's break,
    # raymarching.cu:557, recovered statically; identical outputs/grads for
    # non-truncated rays, and a much smaller bucket once the field trains
    # out of its early fog phase)
    grid_K_policy: str = "live"
    # sample compaction (ops/marching.py make_compact_map): query the field
    # at a GLOBAL budget bucketed from the measured mean marching count
    # instead of the dense [rays, K] slot grid — the encoder fwd/bwd and
    # the hash-gradient scatters then scale with MEAN occupancy (~1/3 of
    # the q95 K on the bench scene). Engages with grid_K_adaptive once
    # count stats exist; the slack factor keeps per-ray truncation rare.
    grid_compact: bool = True
    grid_compact_slack: float = 1.25
    # staged-eval warm-up: which shade K-buckets to pre-compile on the first
    # frame. None = full ladder (no mid-frame compile ever); a short tuple
    # trades possible one-off mid-frame compiles for a much cheaper first
    # frame (bench sets this — remote compiles are minutes each over the
    # tunnel).
    eval_warm_buckets: Optional[Tuple[int, ...]] = None
    # eval/GUI-only AABB override (xmin,ymin,zmin,xmax,ymax,zmax); None =
    # +-bound. The reference's aabb_infer sliders (nerf/gui.py:319-345)
    # mutate only the inference AABB, never the train one.
    aabb_infer: Optional[Tuple[float, ...]] = None
    grid_decay: float = 0.95            # occupancy EMA decay (renderer.py:563)
    # -- model ---------------------------------------------------------------
    backbone: str = "grid"              # 'grid' | 'vanilla' | 'dvgo'
    bg_radius: float = 1.4              # >0: learned background on a sphere
    density_thresh: float = 10.0
    fp16: bool = True                   # bf16 compute on TPU
    # editing mode: path to pretrained DVGO checkpoint (backbone='dvgo');
    # geometry is frozen, only the color MLP trains (reference: network.py:224-312)
    pretrained_dvgo: Optional[str] = None

    # -- render resolution ----------------------------------------------------
    w: int = 64                         # train render width
    h: int = 64                         # train render height
    W: int = 800                        # eval/test render width
    H: int = 800                        # eval/test render height
    jitter_pose: bool = False

    # -- scene / dataset -------------------------------------------------------
    bound: float = 1.0
    dt_gamma: float = 0.0
    min_near: float = 0.1
    radius_range: Tuple[float, float] = (1.0, 1.5)
    fovy_range: Tuple[float, float] = (40.0, 70.0)
    dir_text: bool = False
    suppress_face: bool = False
    angle_overhead: float = 30.0
    angle_front: float = 60.0

    # -- losses ---------------------------------------------------------------
    lambda_entropy: float = 1e-4
    lambda_opacity: float = 0.0
    lambda_orient: float = 1e-2
    lambda_smooth: float = 0.0

    # -- guidance -------------------------------------------------------------
    guidance_scale: float = 100.0       # CFG scale for SDS (reference: sd.py:74)
    sd_weights: Optional[str] = None    # path to converted SD v1.5 flax weights
    clip_weights: Optional[str] = None  # path/name of CLIP weights

    # -- optimizer --------------------------------------------------------------
    optimizer: str = "adam"             # 'adam' | 'shampoo'
    adam_b1: float = 0.9
    adam_b2: float = 0.99
    adam_eps: float = 1e-15
    ema_decay: Optional[float] = None

    # -- eval/test --------------------------------------------------------------
    test_size: int = 100                # frames in the 360° test orbit
    val_size: int = 5
    dataset_size: int = 100             # steps per "epoch"
    max_keep_ckpt: int = 2

    # -- parallelism --------------------------------------------------------------
    # number of devices for data parallelism: 1 = single-device, 0 = all
    # visible devices. Per-device camera batch is batch_size (global batch
    # = n_devices * batch_size), matching DDP semantics (nerf/utils.py:200).
    n_devices: int = 1
    mesh_shape: Optional[Tuple[int, ...]] = None  # None = all devices on 'data'
    mesh_axes: Tuple[str, ...] = ("data",)

    # ---------------------------------------------------------------------------

    @property
    def cascade(self) -> int:
        import math

        return 1 + math.ceil(math.log2(max(self.bound, 1.0)))

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    @staticmethod
    def presets_O(cfg: "Config") -> "Config":
        """-O: bf16 + occupancy-grid marching + dir text (main.py:75-79)."""
        return cfg.replace(fp16=True, dir_text=True, grid_ray=True)

    @staticmethod
    def presets_O2(cfg: "Config") -> "Config":
        """-O2: bf16 + dir text, stratified renderer (main.py:81-84)."""
        return cfg.replace(fp16=True, dir_text=True)

    def finalize(self) -> "Config":
        """Apply backbone-conditional defaults (main.py:86-89)."""
        cfg = self
        if cfg.backbone == "vanilla":
            cfg = cfg.replace(lambda_entropy=0.0, lambda_opacity=1e-3)
        return cfg


def build_argparser() -> argparse.ArgumentParser:
    """CLI mirroring the reference flags (main.py:12-73)."""
    p = argparse.ArgumentParser("dreamfusion_tpu")
    defaults = Config()
    p.add_argument("--text", default=None)
    p.add_argument("--negative", default="", type=str)
    p.add_argument("-O", action="store_true", help="preset: bf16 + grid_ray + dir_text")
    p.add_argument("-O2", action="store_true", help="preset: bf16 + dir_text")
    p.add_argument("--test", action="store_true")
    p.add_argument("--save_mesh", action="store_true")
    p.add_argument("--gui", action="store_true", default=defaults.gui)
    p.add_argument("--platform", default=None, choices=["cpu", "tpu", "axon"],
                   help="force the jax platform (default: environment "
                        "choice). The reference selects GPUs via "
                        "CUDA_VISIBLE_DEVICES; here device selection is a "
                        "jax platform switch, which must happen before "
                        "first device use")
    p.add_argument("--eval_interval", type=int, default=defaults.eval_interval)
    p.add_argument("--workspace", type=str, default=defaults.workspace)
    p.add_argument("--guidance", type=str, default=defaults.guidance)
    p.add_argument("--seed", type=int, default=defaults.seed)
    p.add_argument("--iters", type=int, default=defaults.iters)
    p.add_argument("--lr", type=float, default=defaults.lr)
    p.add_argument("--ckpt", type=str, default=defaults.ckpt)
    p.add_argument("--grid_ray", "--cuda_ray", dest="grid_ray", action="store_true",
                   help="occupancy-grid accelerated marching (the 'cuda_ray' analog)")
    p.add_argument("--max_steps", type=int, default=defaults.max_steps)
    p.add_argument("--num_steps", type=int, default=defaults.num_steps)
    p.add_argument("--upsample_steps", type=int, default=defaults.upsample_steps)
    p.add_argument("--update_extra_interval", type=int, default=defaults.update_extra_interval)
    p.add_argument("--max_ray_batch", type=int, default=defaults.max_ray_batch)
    p.add_argument("--albedo_iters", type=int, default=defaults.albedo_iters)
    p.add_argument("--uniform_sphere_rate", type=float, default=defaults.uniform_sphere_rate)
    p.add_argument("--grid_K", type=int, default=defaults.grid_K)
    p.add_argument("--no_grid_K_adaptive", dest="grid_K_adaptive",
                   action="store_false", default=defaults.grid_K_adaptive)
    p.add_argument("--grid_size", type=int, default=defaults.grid_size)
    p.add_argument("--pallas_composite", dest="pallas_composite",
                   action="store_true", default=defaults.pallas_composite)
    p.add_argument("--no_pallas_composite", dest="pallas_composite",
                   action="store_false")
    p.add_argument("--no_eval_table_bf16", dest="eval_table_bf16",
                   action="store_false", default=defaults.eval_table_bf16)
    p.add_argument("--no_grid_compact", dest="grid_compact",
                   action="store_false", default=defaults.grid_compact)
    p.add_argument("--grid_compact_slack", type=float,
                   default=defaults.grid_compact_slack)
    p.add_argument("--grid_decay", type=float, default=defaults.grid_decay)
    p.add_argument("--test_size", type=int, default=defaults.test_size)
    p.add_argument("--val_size", type=int, default=defaults.val_size)
    p.add_argument("--dataset_size", type=int, default=defaults.dataset_size)
    p.add_argument("--ema_decay", type=float, default=None)
    p.add_argument("--optimizer", type=str, default=defaults.optimizer)
    p.add_argument("--max_keep_ckpt", type=int, default=defaults.max_keep_ckpt)
    p.add_argument("--n_devices", type=int, default=defaults.n_devices,
                   help="data-parallel device count (0 = all visible)")
    p.add_argument("--bg_radius", type=float, default=defaults.bg_radius)
    p.add_argument("--density_thresh", type=float, default=defaults.density_thresh)
    p.add_argument("--fp16", action="store_true")
    p.add_argument("--backbone", type=str, default=defaults.backbone)
    p.add_argument("--pretrained_dvgo", type=str, default=None)
    p.add_argument("--sd_weights", type=str, default=None)
    p.add_argument("--clip_weights", type=str, default=None)
    p.add_argument("--batch_size", type=int, default=defaults.batch_size)
    p.add_argument("--w", type=int, default=defaults.w)
    p.add_argument("--h", type=int, default=defaults.h)
    p.add_argument("--jitter_pose", action="store_true")
    p.add_argument("--bound", type=float, default=defaults.bound)
    p.add_argument("--dt_gamma", type=float, default=defaults.dt_gamma)
    p.add_argument("--min_near", type=float, default=defaults.min_near)
    p.add_argument("--radius_range", type=float, nargs="*", default=list(defaults.radius_range))
    p.add_argument("--fovy_range", type=float, nargs="*", default=list(defaults.fovy_range))
    p.add_argument("--dir_text", action="store_true")
    p.add_argument("--suppress_face", action="store_true")
    p.add_argument("--angle_overhead", type=float, default=defaults.angle_overhead)
    p.add_argument("--angle_front", type=float, default=defaults.angle_front)
    p.add_argument("--lambda_entropy", type=float, default=defaults.lambda_entropy)
    p.add_argument("--lambda_opacity", type=float, default=defaults.lambda_opacity)
    p.add_argument("--lambda_orient", type=float, default=defaults.lambda_orient)
    p.add_argument("--lambda_smooth", type=float, default=defaults.lambda_smooth)
    p.add_argument("--guidance_scale", type=float, default=defaults.guidance_scale)
    p.add_argument("--W", type=int, default=defaults.W)
    p.add_argument("--H", type=int, default=defaults.H)
    return p


def parse_config(argv: Optional[List[str]] = None) -> Config:
    p = build_argparser()
    ns = p.parse_args(argv)
    if getattr(ns, "platform", None):
        import jax
        jax.config.update("jax_platforms", ns.platform)
    kw = {}
    cfg_fields = {f.name for f in dataclasses.fields(Config)}
    for k, v in vars(ns).items():
        if k in cfg_fields:
            if k in ("radius_range", "fovy_range"):
                v = tuple(v)
            kw[k] = v
    cfg = Config(**kw)
    if ns.O:
        cfg = Config.presets_O(cfg)
    elif ns.O2:
        cfg = Config.presets_O2(cfg)
    return cfg.finalize()
