"""dreamfusion_tpu — a TPU-native text-to-3D (DreamFusion) + DVGO NeRF framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of
wukailu/single-stable-dreamfusion (itself a fork of ashawkey/stable-dreamfusion
grafted onto a DVGO pretraining stack). Three pipelines share one renderer core:

1. Text -> 3D from scratch (grid or vanilla NeRF backbone, SDS or CLIP
   guidance, occupancy-grid accelerated raymarching, mesh export).
2. Single-scene appearance editing: a pretrained DVGO field with frozen
   geometry, color MLP fine-tuned under SDS.
3. DVGO pretraining: coarse-to-fine voxel-grid NeRF training that produces
   the checkpoints consumed by pipeline 2.

Design stance (TPU-first, not a port):
- One jitted train step: render + guidance + loss + optimizer update.
- Static shapes everywhere; fixed-K masked ray marching instead of
  atomic-compaction marching (reference: raymarching/src/raymarching.cu).
- SDS expressed as a single scalar loss ``sum(sg(w*(eps_hat-eps)) * latents)``
  instead of the reference's two-phase ``latents.backward(gradient=...)``
  (reference: nerf/sd.py:74-118).
- Data parallelism over the ray/camera batch via ``shard_map`` + ``psum``
  on a ``jax.sharding.Mesh`` (reference used torch DDP, nerf/utils.py:200).
"""

__version__ = "0.1.0"

from dreamfusion_tpu.config import Config  # noqa: F401
