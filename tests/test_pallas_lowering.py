"""Cross-platform TPU lowering of every production Pallas kernel.

Interpret-mode tests (test_pallas_scatter/test_pallas_composite) pin kernel
SEMANTICS but can't catch Mosaic lowering errors (unsupported ops, layout
constraints, VMEM shapes) — those normally only surface on a real chip.
jax.jit(...).trace(...).lower(lowering_platforms=("tpu",)) runs the full
python-side Mosaic lowering on any host, so a kernel that would fail to
build on device fails HERE, in CI. (The final Mosaic->machine-code step
still happens on device; bench.py's pallas_check covers executed
correctness per TPU run.)

Shapes are production-like (J=64k updates, 2^16 table, K=128 composite) —
lowering cost is host-side tracing only, no device work.
"""

import jax
import jax.numpy as jnp
import pytest


def _lower_tpu(fn, *args):
    lowered = jax.jit(fn).trace(*args).lower(lowering_platforms=("tpu",))
    txt = lowered.as_text()
    assert "tpu_custom_call" in txt or "mosaic" in txt.lower(), (
        "expected a Mosaic custom call in the lowered module")
    return txt


J, T = 65536, 65536


@pytest.fixture(scope="module")
def oct_args():
    return (jnp.zeros((J,), jnp.int32), jnp.zeros((8, J), jnp.float32),
            jnp.zeros((J, 2), jnp.float32))


def test_lower_matmul_scatter_add():
    from dreamfusion_tpu.ops.pallas_scatter import matmul_scatter_add

    _lower_tpu(lambda i, a, b: matmul_scatter_add(i, a, b, T),
               jnp.zeros((J,), jnp.int32), jnp.zeros((J,)), jnp.zeros((J,)))


@pytest.mark.parametrize("version", [1, 2])
def test_lower_oct(version, oct_args):
    from dreamfusion_tpu.ops.pallas_scatter import matmul_scatter_add_oct

    _lower_tpu(lambda i, w, c: matmul_scatter_add_oct(
        i, w, c, T, version=version), *oct_args)


@pytest.mark.parametrize("transposed", [False, True])
def test_lower_oct_binned(oct_args, transposed):
    from dreamfusion_tpu.ops.pallas_scatter import \
        matmul_scatter_add_oct_binned

    _lower_tpu(lambda i, w, c: matmul_scatter_add_oct_binned(
        i, w, c, T, transposed=transposed), *oct_args)


@pytest.mark.parametrize("version", [1, 2])
def test_lower_wide(version):
    from dreamfusion_tpu.ops.pallas_scatter import matmul_scatter_add_wide

    _lower_tpu(lambda i, u: matmul_scatter_add_wide(i, u, T, version=version),
               jnp.zeros((J,), jnp.int32), jnp.zeros((16, J), jnp.float32))


def test_lower_probe_select_small():
    from dreamfusion_tpu.ops.pallas_probe import probe_select_small

    # pooled 32^3 occupancy at the 800^2 coarse-classify probe count scale
    _lower_tpu(lambda t, i: probe_select_small(t, i),
               jnp.zeros((32768,), jnp.uint8),
               jnp.zeros((2 ** 20,), jnp.int32))


def test_lower_composite_fused():
    from dreamfusion_tpu.ops.pallas_composite import composite_fused

    N, K = 4096, 128
    _lower_tpu(lambda s, r, d, t: composite_fused(s, r, d, t),
               jnp.zeros((N, K)), jnp.zeros((N, K, 3)), jnp.zeros((N, K)),
               jnp.zeros((N, K)))


@pytest.mark.parametrize("B,H,N,D,with_grad", [
    (2, 8, 4096, 40, False),    # UNet 64^2 self-attn (fwd-only in SDS)
    (1, 1, 4096, 512, True),    # VAE mid-block attn (in the SDS grad path)
])
def test_lower_flash_attention(B, H, N, D, with_grad):
    """The SD attention core's flash path (and its VJP where the SDS loss
    differentiates through it) must lower for the Mosaic TPU target at the
    production shapes."""
    from dreamfusion_tpu.guidance.sd.layers import attention_core

    q = jnp.zeros((B, N, H, D), jnp.bfloat16)

    def fwd(q, k, v):
        return attention_core(q, k, v, 0.1, jnp.bfloat16, impl="flash")

    if with_grad:
        fn = jax.grad(lambda q, k, v: jnp.sum(
            fwd(q, k, v).astype(jnp.float32)), argnums=(0, 1, 2))
    else:
        fn = fwd
    _lower_tpu(fn, q, q, q)


def test_attention_core_gate():
    """auto -> einsum off-TPU; forced flash respects the shape gate; typos
    raise (same discipline as DFTPU_SCATTER_IMPL)."""
    from dreamfusion_tpu.guidance.sd import layers

    assert not layers._use_flash(4096, 4096, impl="auto")  # CPU backend
    assert layers._use_flash(4096, 4096, impl="flash")
    assert not layers._use_flash(4096, 77, impl="flash")   # cross-attn
    assert not layers._use_flash(1024, 1024, impl="flash")  # below min seq
    assert not layers._use_flash(4096, 4096, impl="einsum")
    with pytest.raises(ValueError):
        layers._use_flash(4096, 4096, impl="flashh")
