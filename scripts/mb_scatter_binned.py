"""Microbench: binned (sorted-window) vs unbinned oct matmul-scatter on TPU.

The binned kernel (pallas_scatter.matmul_scatter_add_oct_binned) cuts MXU
FLOP 32x at the production 2^16 table but pays an XLA lax.sort (1 key +
10 payload vectors) per level. This measures, at production shapes:

  1. the bare sort (the binning overhead in isolation),
  2. oct v2 (the current default), v1,
  3. the binned kernel end-to-end (sort + tile list + kernel),
  4. the XLA scatter-add oracle (baseline).

Decision rule: flip DFTPU_SCATTER_IMPL / grid_encoder.SCATTER_IMPL default
to "binned" iff (3) beats (2) at J=262144 AND J=131072 (the post-compaction
budget). Timing: R chained reps in one jitted program, inputs perturbed per
rep so nothing folds, one float() D2H pull at the end (NOTES.md method).
"""
import time

import jax
import jax.numpy as jnp

from dreamfusion_tpu.ops.pallas_scatter import (
    matmul_scatter_add_oct, matmul_scatter_add_oct_binned)

T = 1 << 16
R = 20


def run(fn, *args):
    f = jax.jit(fn)
    _ = float(f(*args))  # compile + warm
    best = float("inf")
    for _rep in range(3):
        t0 = time.perf_counter()
        _ = float(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best / R


def main():
    for J in (262144, 131072):
        key = jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(key, 3)
        idx = jax.random.randint(k1, (J,), 0, T, dtype=jnp.int32)
        w8 = jax.random.normal(k2, (8, J))
        cot2 = jax.random.normal(k3, (J, 2))
        print(f"--- J={J}, T={T}, R={R} chained ---", flush=True)

        def bare_sort(idx, w8, cot2):
            # consume one element of EVERY output so the sort simplifier
            # can't prune payload operands; is_stable=False matches the
            # kernel's sort exactly
            acc = jnp.float32(0.0)
            for i in range(R):
                ops = (((idx + i) % T), *(w8[c] for c in range(8)),
                       cot2[:, 0], cot2[:, 1])
                out = jax.lax.sort(ops, num_keys=1, is_stable=False)
                acc += out[0][0].astype(jnp.float32) + sum(
                    o[i % T] for o in out[1:])
            return acc

        dt = run(bare_sort, idx, w8, cot2)
        print(f"lax.sort 1key+10pay : {dt * 1e3:7.2f} ms", flush=True)

        def packed_sort(idx, w8, cot2):
            # candidate mitigation if the 11-operand sort is the wall:
            # round payloads to bf16 and bitcast PAIRS into i32 words
            # (1 key + 5 payload operands, ~45% less comparator-phase
            # bandwidth). Includes the pack+unpack cost. The kernel casts
            # w*cot to bf16 anyway, so rounding the factors is within the
            # kernel's existing precision budget.
            w4i = jax.lax.bitcast_convert_type(
                w8.astype(jnp.bfloat16).reshape(4, J, 2), jnp.int32)
            c1i = jax.lax.bitcast_convert_type(
                cot2.astype(jnp.bfloat16), jnp.int32)
            acc = jnp.float32(0.0)
            for i in range(R):
                ops = (((idx + i) % T), w4i[0], w4i[1], w4i[2], w4i[3], c1i)
                out = jax.lax.sort(ops, num_keys=1, is_stable=False)
                unp = [jax.lax.bitcast_convert_type(o, jnp.bfloat16)
                       for o in out[1:]]
                acc += out[0][0].astype(jnp.float32) + sum(
                    u[i % T, 0].astype(jnp.float32) for u in unp)
            return acc

        dt = run(packed_sort, idx, w8, cot2)
        print(f"lax.sort packed 1key+5pay : {dt * 1e3:7.2f} ms", flush=True)

        def make_scatter(kind):
            def fn(idx, w8, cot2):
                acc = jnp.float32(0.0)
                for i in range(R):
                    ix = (idx + i) % T
                    if kind == "binned":
                        d = matmul_scatter_add_oct_binned(ix, w8, cot2, T)
                    elif kind == "xla":
                        upd = (w8.T[:, :, None] * cot2[:, None, :]
                               ).reshape(-1, 16)
                        d = jnp.zeros((T, 16), jnp.float32).at[ix].add(upd)
                    else:
                        d = matmul_scatter_add_oct(ix, w8, cot2, T,
                                                   version=kind)
                    acc += jnp.sum(d[0]) + d[T // 2, 0]
                return acc
            return fn

        for kind, label in ((2, "oct v2 (default)"), (1, "oct v1"),
                            ("binned", "oct binned (sort+k)"),
                            ("xla", "xla scatter oracle")):
            dt = run(make_scatter(kind), idx, w8, cot2)
            rate = J / dt / 1e6
            print(f"{label:20s}: {dt * 1e3:7.2f} ms  ({rate:6.0f}M rows/s)",
                  flush=True)


if __name__ == "__main__":
    main()
