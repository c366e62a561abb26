"""STEM_WGRAD_S2D (models/resnet.py): the wgrad-only space-to-depth rewrite
of the stem conv must be bit-exact against plain autodiff of the direct conv
in forward, dx, and dW.  The lever measured SLOWER on device and ships
default-off (BASELINE.md r5); this pins the flag's correctness."""

import numpy as np
import jax
import jax.numpy as jnp

from alignsdf_tpu.models.resnet import StemConv, _stem_conv_s2d_wgrad


def _direct(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_s2d_wgrad_bit_exact():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    k = jnp.asarray(rng.randn(7, 7, 3, 8).astype(np.float32) * 0.1)

    np.testing.assert_array_equal(np.asarray(_stem_conv_s2d_wgrad(x, k)),
                                  np.asarray(_direct(x, k)))

    ga = jax.grad(lambda x, k: jnp.sum(jnp.sin(_stem_conv_s2d_wgrad(x, k))),
                  argnums=(0, 1))(x, k)
    gb = jax.grad(lambda x, k: jnp.sum(jnp.sin(_direct(x, k))),
                  argnums=(0, 1))(x, k)
    for a, b in zip(ga, gb):
        rel = float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-12))
        assert rel < 1e-6, rel


def test_stem_conv_odd_size_falls_back():
    x = jnp.zeros((1, 31, 31, 3))
    m = StemConv(8)
    v = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(v, x).shape == (1, 16, 16, 8)
