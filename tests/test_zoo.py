"""Model-zoo variant tests: every registered field renders and trains."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamfusion_tpu.models.zoo import (DVGO360, FFL, FastFFL, NeRFWoNN,
                                        get_field, field_registry)


def _render_field(field, key=0, with_key=True):
    k = jax.random.PRNGKey(key)
    o = jnp.tile(jnp.array([[0.0, 0.0, -3.0]]), (4, 1))
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (4, 1))
    n = field.n_render_samples(6.0)
    params = field.init(k, o, d, d, near=0.1, far=6.0, bg=1.0, n_samples=n,
                        method=field.render)
    out = field.apply(params, o, d, d, near=0.1, far=6.0, bg=1.0, n_samples=n,
                      key=k if with_key else None, method=field.render)
    return params, out


@pytest.mark.parametrize("name,kw", [
    ("dvp_fine", dict(k0_dim=4, rgbnet_name="basicmlp", rgbnet_width=16,
                      rgbnet_depth=3, posbase_pe=2, viewbase_pe=2)),
    ("nwnn_fine", dict(k0_dim=12, rgbnet_name=None)),   # 3 * 2^2 SH
    ("ffl_fine", dict(k0_dim=4, rgbnet_name="basicmlp", rgbnet_width=16,
                      rgbnet_depth=3, posbase_pe=2, viewbase_pe=2)),
    ("fastffl_fine", dict(k0_dim=4, rgbnet_name="basicmlp", rgbnet_width=16,
                          rgbnet_depth=3, posbase_pe=2, viewbase_pe=2)),
    ("dvgo360_fine", dict(k0_dim=4, rgbnet_name="basicmlp", rgbnet_width=16,
                          rgbnet_depth=3, posbase_pe=2, viewbase_pe=2)),
])
@pytest.mark.slow
def test_zoo_fields_render_and_grad(name, kw):
    field = get_field(name, world_size=(8, 8, 8), alpha_init=1e-2, **kw)
    params, out = _render_field(field)
    assert out["rgb_marched"].shape == (4, 3)
    assert bool(jnp.all(jnp.isfinite(out["rgb_marched"])))
    assert float(out["weights"].sum(-1).max()) <= 1.0 + 1e-5

    def loss(p):
        o = jnp.tile(jnp.array([[0.0, 0.0, -3.0]]), (4, 1))
        d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (4, 1))
        r = field.apply(p, o, d, d, near=0.1, far=6.0, bg=1.0,
                        n_samples=field.n_render_samples(6.0),
                        key=jax.random.PRNGKey(1), method=field.render)
        return jnp.mean((r["rgb_marched"] - 0.3) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_nwnn_matches_svox2_basis():
    """NeRFWoNN color is sigmoid(SH . coeffs); degree-2 check against the
    svox2 constants (nwnn_fine.py:36-76)."""
    field = NeRFWoNN(world_size=(4, 4, 4), k0_dim=12, rgbnet_name=None)
    k = jax.random.PRNGKey(0)
    pts = jnp.zeros((2, 3))
    vd = jnp.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    params = field.init(k, pts, vd, method=field.query_rgb)
    rgb = field.apply(params, pts, vd, method=field.query_rgb)
    # manual: sample k0 at center, combine with SH basis
    from dreamfusion_tpu.ops.grid_sample import grid_sample_3d

    k0 = grid_sample_3d(params["params"]["k0"], jnp.full((2, 3), 0.5))
    C0, C1 = 0.28209479177387814, 0.4886025119029199
    sh = np.stack([[C0, -C1 * v[1], C1 * v[2], -C1 * v[0]]
                   for v in np.asarray(vd)])
    want = 1 / (1 + np.exp(-(np.asarray(k0).reshape(2, 3, 4) * sh[:, None, :]).sum(-1)))
    np.testing.assert_allclose(np.asarray(rgb), want, rtol=1e-5)


def test_ffl_liif_weights_partition():
    """Trilinear LIIF weights must sum to 1 (the runtime assert at
    ffl_fine.py:32-33)."""
    field = FFL(world_size=(8, 8, 8), k0_dim=4, rgbnet_name="basicmlp",
                rgbnet_width=8, rgbnet_depth=3, posbase_pe=1, viewbase_pe=1)
    k = jax.random.PRNGKey(0)
    pts = jax.random.uniform(k, (16, 3), minval=-0.9, maxval=0.9)
    vd = jnp.tile(jnp.array([[0.0, 0, 1.0]]), (16, 1))
    params = field.init(k, pts, vd, method=field._liif_features)
    pred, w = field.apply(params, pts, vd, method=field._liif_features)
    np.testing.assert_allclose(np.asarray(jnp.sum(w, -1)), 1.0, atol=1e-3)
    assert pred.shape == (16, 8, 4)


def test_dvgo360_contraction_roundtrip():
    field = DVGO360(world_size=(8, 8, 8), k0_dim=3, bg_dis=0.2)
    k = jax.random.PRNGKey(0)
    far_pts = jax.random.normal(k, (32, 3)) * 5.0
    c = field.world_to_contract(far_pts)
    # contracted space is bounded by r*(1+bg_dis)
    assert float(jnp.abs(c).max()) <= 1.0 + 0.2 + 1e-4
    back = field.contract_to_world(c)
    np.testing.assert_allclose(np.asarray(back), np.asarray(far_pts),
                               rtol=1e-4, atol=1e-4)
    # inner points unchanged
    inner = jnp.array([[0.3, -0.2, 0.1]])
    np.testing.assert_allclose(np.asarray(field.world_to_contract(inner)),
                               np.asarray(inner), atol=1e-6)
    # normalize maps everything into [0, 1]
    n = field.normalize(far_pts)
    assert float(n.min()) >= -1e-5 and float(n.max()) <= 1.0 + 1e-5
