"""Microbench: SD VAE encode fwd+bwd on the real TPU — where do 45 ms go?

The round-3 train-step trace attributes ~45 ms/step to the VAE encode at
~19% MXU utilisation (SDS differentiates through the encoder,
reference nerf/sd.py:156-164). This isolates it: run encode fwd+bwd at the
production shape (1x512x512x3, SD-v1.5 geometry, bf16), print wall ms +
achieved TFLOP/s, then capture a profiler trace and attribute device time
per fused op (reusing profile_eval.summarize). A/B variants:

  - attention einsum in bf16 vs f32 (mid-block, 4096 tokens)
  - GroupNorm stats in f32 (TPUGroupNorm default) vs bf16 end-to-end

Decision: whatever the trace shows as the non-MXU wall (GroupNorm HBM
passes, transposed-conv backward, layout changes) becomes the next kernel
or layout fix.
"""
import argparse
import time

import jax
import jax.numpy as jnp

from dreamfusion_tpu.guidance.sd.vae import sd15_vae

# encoder FLOP at 512^2 (convs only, fwd): ~1.0 TFLOP; fwd+bwd ~3x;
# scales with H^2 (blocks halve spatial while doubling channels)
ENC_FWD_TFLOP = 1.02


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--H", type=int, default=512)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--out", default="/tmp/trace_vae")
    args = ap.parse_args()

    # init on a LOCAL cpu backend when tunneled (numpy-speed eager init,
    # one bulk transfer) — same trick as sds.py/bench.py
    import os
    try:
        if (os.environ.get("JAX_PLATFORMS", "") == "axon"
                and jax.config.jax_platforms != "cpu"):
            jax.config.update("jax_platforms", "axon,cpu")
    except Exception:
        pass
    vae = sd15_vae(dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (1, args.H, args.H, 3), jnp.float32) * 2 - 1
    try:
        cpu = jax.devices("cpu")[0]
    except Exception:
        cpu = None
    if cpu is not None and jax.devices()[0].platform != "cpu":
        from dreamfusion_tpu.guidance.sd import layers as _sdl

        old_impl = _sdl.ATTN_IMPL       # flash kernel has no CPU mode
        _sdl.ATTN_IMPL = "einsum"
        try:
            with jax.default_device(cpu):
                params = vae.init(key, jax.device_put(x, cpu), key)
        finally:
            _sdl.ATTN_IMPL = old_impl
        params = jax.device_put(params, jax.devices()[0])
    else:
        params = vae.init(key, x, key)

    def loss(p, x, k):
        z = vae.apply(p, x, k, method=vae.encode)
        return jnp.sum(jnp.square(z.astype(jnp.float32)))

    gfn = jax.jit(jax.value_and_grad(loss, argnums=1))  # grad wrt the IMAGE
    # (SDS backprops into pred_rgb, not the VAE params — match that)

    def chain(x, k):
        acc = jnp.float32(0.0)
        for i in range(args.reps):
            v, g = gfn(params, x + 1e-6 * i, jax.random.fold_in(k, i))
            acc += v + jnp.sum(g[0, 0, 0, :].astype(jnp.float32))
        return acc

    cfn = jax.jit(chain)
    _ = float(cfn(x, key))            # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(cfn(x, key))
        best = min(best, time.perf_counter() - t0)
    per = best / args.reps
    tflops = ENC_FWD_TFLOP * (args.H / 512) ** 2 * 3 / per
    print(f"vae encode fwd+bwd @ {args.H}^2: {per * 1e3:.1f} ms/call "
          f"(~{tflops:.0f} TFLOP/s achieved vs ~197 bf16 peak)", flush=True)

    jax.profiler.start_trace(args.out, create_perfetto_trace=True)
    _ = float(cfn(x, key))
    jax.profiler.stop_trace()
    import sys
    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from profile_eval import summarize
    summarize(args.out, top=25)


if __name__ == "__main__":
    main()
