"""Encoder variant flags compute identical math:
  - TorchConvTranspose.phase_decomposed (4 phase convs vs lhs-dilated form)
  - TorchConvTranspose.custom_grad (direct-form backward convs, DEFAULT)
  - StemConv.space_to_depth (4x4/s1 conv on 2x2-s2d input vs 7x7/s2)
The non-default variants are measured experiments (BASELINE.md)."""

import jax
import jax.numpy as jnp
import numpy as np

from alignsdf_tpu.models.resnet import StemConv, TorchConvTranspose


def test_phase_decomposed_matches_dilated():
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 8, 8, 16))
    ref_mod = TorchConvTranspose(24, custom_grad=False)
    variables = ref_mod.init(jax.random.PRNGKey(1), x)
    ref = ref_mod.apply(variables, x)
    got = TorchConvTranspose(24, phase_decomposed=True).apply(variables, x)
    assert got.shape == ref.shape == (3, 16, 16, 24)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_custom_grad_matches_autodiff():
    """The direct-form backward convs (default) vs XLA autodiff of the
    lhs-dilated forward: dx exact, dW to f32 reorder tolerance."""
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 16))
    mod_new = TorchConvTranspose(24, custom_grad=True)
    mod_old = TorchConvTranspose(24, custom_grad=False)
    variables = mod_new.init(jax.random.PRNGKey(3), x)

    def loss(mod, v, x_):
        y = mod.apply(v, x_)
        return jnp.sum(jnp.sin(y) * y)

    np.testing.assert_array_equal(
        np.asarray(mod_new.apply(variables, x)),
        np.asarray(mod_old.apply(variables, x)))
    g_new = jax.grad(loss, argnums=(1, 2))(mod_new, variables, x)
    g_old = jax.grad(loss, argnums=(1, 2))(mod_old, variables, x)
    np.testing.assert_array_equal(np.asarray(g_new[1]), np.asarray(g_old[1]))
    dw_new = g_new[0]["params"]["kernel"]
    dw_old = g_old[0]["params"]["kernel"]
    scale = float(jnp.abs(dw_old).max())
    np.testing.assert_allclose(np.asarray(dw_new) / scale,
                               np.asarray(dw_old) / scale, atol=1e-5)


def test_space_to_depth_stem_matches_direct_conv():
    """StemConv.space_to_depth is an exact rewrite of conv 7x7/s2/p3 (same
    products; zero taps where the padded 8x8 kernel has no source), forward
    and both gradients."""
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 64, 64, 3))
    m1 = StemConv(64, space_to_depth=True)
    m0 = StemConv(64, space_to_depth=False)
    v = m1.init(jax.random.PRNGKey(5), x)

    def loss(mod, vv, xx):
        return jnp.sum(jnp.sin(mod.apply(vv, xx)))

    y1, y0 = m1.apply(v, x), m0.apply(v, x)
    assert y1.shape == y0.shape == (2, 32, 32, 64)
    ref = float(jnp.abs(y0).max())
    assert float(jnp.abs(y1 - y0).max()) < 1e-5 * ref
    g1 = jax.grad(loss, argnums=(1, 2))(m1, v, x)
    g0 = jax.grad(loss, argnums=(1, 2))(m0, v, x)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g0)):
        s = float(jnp.abs(b).max())
        assert float(jnp.abs(a - b).max()) < 1e-5 * s
