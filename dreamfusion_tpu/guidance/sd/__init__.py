"""Stable Diffusion v1.5 guidance, implemented natively in flax (no diffusers).

Components:
- unet.py       — UNet2DCondition (SD v1.5 geometry), NHWC, bf16-able
- vae.py        — AutoencoderKL encoder/decoder
- scheduler.py  — scaled-linear DDPM constants + add_noise + DDIM/PNDM sampling
- convert.py    — torch(diffusers) checkpoint -> flax params converter
- sds.py        — Score Distillation Sampling as a single scalar loss

Reference: nerf/sd.py (which loads runwayml/stable-diffusion-v1-5 through
diffusers). Here the models are our own flax modules so the whole SDS step
jits into the training program; weights are converted from a local SD
checkpoint with convert.py when available, otherwise random-init (tests,
perf benchmarking at true scale).
"""

from dreamfusion_tpu.guidance.sd.sds import build_sd_guidance  # noqa: F401
