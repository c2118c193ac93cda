"""Gather microbench for the staged-eval hot shapes (round 5b).

The 800^2 ball trace (per 2 frames) attributes most of the frame to XLA
gathers: 16x 18.2 ms bf16[131072,16] hash-level row takes, 3x 72.9 ms
f32[131072] compact element takes (indices strictly increasing), and a
106 ms f32[524288,128] density row take. This measures, on the real
chip, the levers that could change their lowering:

  1. indices_are_sorted on the compact element takes (fwd_flat is
     strictly increasing by construction — one cumsum);
  2. f32 vs bf16 oct-table row gathers ([131072, 16] from [65536, 16]) —
     eval_table_bf16 was defaulted on without a device A/B, and bf16's
     (2,1) sublane packing may force a slower gather emitter;
  3. element-take throughput baseline at the trace's exact shapes.

Timing: wall clock over ITERS dispatched iterations with one D2H sync at
the end (NOTES.md: block_until_ready is unreliable over the tunnel;
per-dispatch float() is pathologically slow — amortize over many).
"""
import json
import os
import time

import jax
import jax.numpy as jnp

CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

ITERS = int(os.environ.get("MB_ITERS", "50"))


def timed(name, fn, *args):
    out = fn(*args)                      # compile + warm
    _ = float(jnp.sum(out[-1] if isinstance(out, tuple) else out))
    t0 = time.perf_counter()
    for _i in range(ITERS):
        out = fn(*args)
    _ = float(jnp.sum(out[-1] if isinstance(out, tuple) else out))
    dt = (time.perf_counter() - t0) / ITERS
    print(json.dumps({"bench": name, "ms": round(dt * 1e3, 3)}), flush=True)
    return dt


def main():
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)

    # -- 1. compact element takes: [131072] from [1048576] ----------------
    src = jax.random.normal(k1, (1048576,))
    idx_sorted = jnp.sort(jax.random.permutation(
        k2, jnp.arange(1048576, dtype=jnp.int32))[:131072])
    idx_rand = jax.random.permutation(
        k3, jnp.arange(1048576, dtype=jnp.int32))[:131072]

    @jax.jit
    def take_plain(s, i):
        return jnp.take(s, i)

    @jax.jit
    def take_sorted_hint(s, i):
        return jnp.take(s, i, indices_are_sorted=True, unique_indices=True)

    timed("elem_take_131k_rand", take_plain, src, idx_rand)
    timed("elem_take_131k_sortedidx_nohint", take_plain, src, idx_sorted)
    timed("elem_take_131k_sortedidx_hint", take_sorted_hint, src, idx_sorted)

    # three fused takes in one program (the shade does t/dt/sigma-adjacent
    # takes together): does batching change the per-take cost?
    src2 = jax.random.normal(jax.random.fold_in(key, 9), (1048576,))
    src3 = jax.random.normal(jax.random.fold_in(key, 10), (1048576,))

    @jax.jit
    def take3_hint(a, b, c, i):
        kw = dict(indices_are_sorted=True, unique_indices=True)
        return (jnp.take(a, i, **kw) + jnp.take(b, i, **kw)
                + jnp.take(c, i, **kw))

    timed("elem_take3_fused_hint", take3_hint, src, src2, src3, idx_sorted)

    # -- 2. oct-table row gathers: [131072, 16] from [65536, 16] ----------
    tab32 = jax.random.normal(jax.random.fold_in(key, 4), (65536, 16))
    tab16 = tab32.astype(jnp.bfloat16)
    hidx = jax.random.randint(jax.random.fold_in(key, 5), (131072,), 0,
                              65536, dtype=jnp.int32)

    @jax.jit
    def row_take_f32(t, i):
        return jnp.take(t, i, axis=0)

    @jax.jit
    def row_take_bf16(t, i):
        return jnp.take(t, i, axis=0)

    timed("octrow_take_f32", row_take_f32, tab32, hidx)
    timed("octrow_take_bf16", row_take_bf16, tab16, hidx)

    # bf16 table gathered then cast (the eval shade consumes f32): does the
    # cast-inside-consumer change the emitter choice?
    @jax.jit
    def row_take_bf16_cast(t, i):
        return jnp.take(t, i, axis=0).astype(jnp.float32)

    timed("octrow_take_bf16_cast", row_take_bf16_cast, tab16, hidx)

    # 16 levels in one program (the real shade shape)
    @jax.jit
    def levels16(t, i):
        acc = 0.0
        for lvl in range(16):
            acc = acc + jnp.sum(jnp.take(t, (i + lvl) % 65536, axis=0)
                                .astype(jnp.float32), axis=1)
        return acc

    timed("octrow_16levels_f32", levels16, tab32, hidx)
    timed("octrow_16levels_bf16", levels16, tab16, hidx)

    # -- 3. density row take: [524288, 128] rows from [16384, 128] --------
    dg = jax.random.normal(jax.random.fold_in(key, 6), (16384, 128))
    didx = jax.random.randint(jax.random.fold_in(key, 7), (524288,), 0,
                              16384, dtype=jnp.int32)

    @jax.jit
    def density_row_reduce(t, i):
        rows = jnp.take(t, i, axis=0)                     # [J, 128]
        lane = (i[:, None] & 127) == jax.lax.broadcasted_iota(
            jnp.int32, (i.shape[0], 128), 1)
        return jnp.sum(jnp.where(lane, rows, 0.0), axis=1)

    timed("density_rowtake_reduce_524k", density_row_reduce, dg, didx)


if __name__ == "__main__":
    main()
