"""OSR relighting variant tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamfusion_tpu.models.osr import (AnnealingPosEmbedder, OSR_Fine,
                                        OSR_Fine_RGI, OSR_Fine_V2,
                                        OSR_Fine_V3, OSR_Fine_V6,
                                        illuminate_vec)
from dreamfusion_tpu.models.zoo import get_field


def test_illuminate_vec_constant_env():
    """A DC-only environment lights every normal equally."""
    env = jnp.zeros((9, 3)).at[0].set(jnp.array([1.0, 2.0, 3.0]))
    n = jnp.array([[0.0, 0, 1.0], [1.0, 0, 0]])
    irr = illuminate_vec(n, env)
    assert irr.shape == (2, 3)
    np.testing.assert_allclose(np.asarray(irr[0]), np.asarray(irr[1]),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(irr[0]),
                               0.282095 * np.array([1, 2, 3]), rtol=1e-5)


def test_annealing_pos_embedder():
    emb = AnnealingPosEmbedder(n_freqs=4, N_anneal=100)
    x = jnp.ones((2, 3)) * 0.5
    out0 = emb(x, 0)
    out_full = emb(x, 100)
    assert out0.shape == (2, 3 + 3 * 4 * 2)
    # at step 0 all annealed bands are off (weights 0), input passthrough kept
    np.testing.assert_allclose(np.asarray(out0[:, 3:]), 0.0, atol=1e-6)
    assert float(jnp.abs(out_full[:, 3:]).max()) > 0.1


@pytest.mark.parametrize("name,kw", [
    ("osr_fine", dict(rgbnet_name="shadowmlp")),
    ("osr_v2_fine", dict(rgbnet_name="shadowmlp")),
    ("osr_v3_fine", dict(rgbnet_name="basicmlp", posbase_pe=2, viewbase_pe=2)),
    ("osr_v4_fine", dict(rgbnet_name="separateshadowmlp", posbase_pe=2,
                         viewbase_pe=2)),
    ("osr_v6_fine", dict(rgbnet_name="basicmlp", posbase_pe=2, viewbase_pe=2)),
    ("osr_rgi_fine", dict(rgbnet_name="basicmlp", posbase_pe=2,
                          viewbase_pe=2)),
])
@pytest.mark.slow
def test_osr_variants_render_and_grad(name, kw):
    field = get_field(name, world_size=(8, 8, 8), k0_dim=4, alpha_init=1e-2,
                      rgbnet_width=16, rgbnet_depth=3, **kw)
    key = jax.random.PRNGKey(0)
    o = jnp.tile(jnp.array([[0.0, 0.0, -3.0]]), (4, 1))
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (4, 1))
    n = field.n_render_samples(6.0)
    params = field.init(key, o, d, d, near=0.1, far=6.0, bg=1.0, n_samples=n,
                        method=field.render)
    out = field.apply(params, o, d, d, near=0.1, far=6.0, bg=1.0,
                      n_samples=n, key=key, method=field.render)
    assert out["rgb_marched"].shape == (4, 3)
    assert bool(jnp.all(jnp.isfinite(out["rgb_marched"])))
    if name in ("osr_fine", "osr_v2_fine"):
        assert "normal_marched" in out and "shadow_marched" in out
        # env param exists and receives gradient
        def loss(p):
            r = field.apply(p, o, d, d, near=0.1, far=6.0, bg=1.0,
                            n_samples=n, key=key, method=field.render)
            return jnp.mean(r["rgb_marched"] ** 2)
        g = jax.grad(loss)(params)
        assert float(jnp.abs(g["params"]["env"]).max()) > 0

    if name == "osr_v3_fine":
        # shadow floor: raw_shadow in [shadow_bar, 1]
        s = np.asarray(out["raw_shadow"])
        live = s[s != 1.0]
        if live.size:
            assert live.min() >= field.shadow_bar - 1e-5


@pytest.mark.slow
def test_osr_v6_zero_k0_init():
    field = OSR_Fine_V6(world_size=(4, 4, 4), k0_dim=3,
                        rgbnet_name="basicmlp", rgbnet_width=8,
                        rgbnet_depth=3, posbase_pe=1, viewbase_pe=1)
    o = jnp.zeros((1, 3))
    d = jnp.tile(jnp.array([[0.0, 0, 1.0]]), (1, 1))
    params = field.init(jax.random.PRNGKey(0), o, d, d, near=0.1, far=3.0,
                        bg=1.0, n_samples=4, method=field.render)
    np.testing.assert_allclose(np.asarray(params["params"]["k0"]), 0.0)
