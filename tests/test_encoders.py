"""Encoder tests: frequency, spherical harmonics, trunc_exp."""

import math

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from dreamfusion_tpu.ops import freq_encode, sh_encode, trunc_exp
from dreamfusion_tpu.ops.encoders import freq_output_dim, sh_output_dim, get_encoder


def test_freq_encode_values():
    x = jnp.array([[0.3, -0.7, 1.2]])
    out = freq_encode(x, degree=4)
    assert out.shape == (1, freq_output_dim(3, 4))  # 27 (freq.py:61)
    np.testing.assert_allclose(np.asarray(out[0, :3]), [0.3, -0.7, 1.2], atol=1e-6)
    # first sin block is sin(2^0 * x)
    np.testing.assert_allclose(np.asarray(out[0, 3:6]),
                               np.sin([0.3, -0.7, 1.2]), atol=1e-6)
    # last cos block is cos(8x)
    np.testing.assert_allclose(np.asarray(out[0, -3:]),
                               np.cos(np.array([0.3, -0.7, 1.2]) * 8), atol=1e-5)


def test_freq_encode_grad():
    w = jnp.asarray(np.random.RandomState(0).randn(freq_output_dim(3, 2)),
                    jnp.float32)
    f = lambda x: jnp.sum(freq_encode(x, degree=2) * w)
    x0 = jnp.array([0.1, 0.2, 0.3])
    g = jax.grad(f)(x0)
    eps = 1e-3
    for d in range(3):
        e = jnp.zeros(3).at[d].set(eps)
        fd = (f(x0 + e) - f(x0 - e)) / (2 * eps)
        np.testing.assert_allclose(float(g[d]), float(fd), rtol=1e-2, atol=1e-4)


def test_sh_low_order_matches_reference_table():
    """Check against the hardcoded constants in shencoder/src/shencoder.cu:28-60."""
    d = jnp.array([[0.3, -0.5, 0.81240384]])  # unit
    x, y, z = 0.3, -0.5, 0.81240384
    out = np.asarray(sh_encode(d, degree=3)[0])
    expect = [
        0.28209479177387814,
        -0.48860251190291987 * y,
        0.48860251190291987 * z,
        -0.48860251190291987 * x,
        1.0925484305920792 * x * y,
        -1.0925484305920792 * y * z,
        0.94617469575755997 * z * z - 0.31539156525251999,
        -1.0925484305920792 * x * z,
        0.54627421529603959 * (x * x - y * y),
    ]
    np.testing.assert_allclose(out, expect, atol=1e-6)


@pytest.mark.slow
def test_sh_orthonormality_high_degree():
    """Monte-Carlo check that 4*pi*E[Y_i Y_j] = delta_ij for degree 8."""
    key = jax.random.PRNGKey(0)
    v = jax.random.normal(key, (200000, 3))
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    Y = sh_encode(v, degree=8)  # [N, 64]
    gram = 4 * math.pi * (Y.T @ Y) / v.shape[0]
    np.testing.assert_allclose(np.asarray(gram), np.eye(sh_output_dim(8)),
                               atol=0.06)


def test_trunc_exp_forward_and_clamped_grad():
    x = jnp.array([-20.0, 0.0, 5.0, 20.0])
    np.testing.assert_allclose(np.asarray(trunc_exp(x)), np.exp(np.asarray(x)),
                               rtol=1e-5)
    g = jax.grad(lambda v: jnp.sum(trunc_exp(v)))(x)
    # grads use exp(clip(x, -15, 15)) (activation.py:15)
    expect = np.exp(np.clip(np.asarray(x), -15, 15))
    np.testing.assert_allclose(np.asarray(g), expect, rtol=1e-5)


def test_encoder_factory():
    f, dim = get_encoder("frequency", input_dim=3, multires=6)
    assert dim == 39
    assert f(jnp.zeros((2, 3))).shape == (2, 39)
    f, dim = get_encoder("sphere_harmonics", degree=4)
    assert dim == 16
    f, dim = get_encoder("None", input_dim=5)
    assert dim == 5
