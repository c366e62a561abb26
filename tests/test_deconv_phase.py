"""TorchConvTranspose.phase_decomposed computes the identical transposed conv
(4 phase convs with 2x2 taps vs the lhs-dilated form).  The dilated form is
the default — on TPU XLA already skips the dilation zeros and the phase
rewrite measured slower end-to-end; the flag documents the experiment."""

import jax
import jax.numpy as jnp
import numpy as np

from alignsdf_tpu.models.resnet import TorchConvTranspose


def test_phase_decomposed_matches_dilated():
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 8, 8, 16))
    ref_mod = TorchConvTranspose(24)
    variables = ref_mod.init(jax.random.PRNGKey(1), x)
    ref = ref_mod.apply(variables, x)
    got = TorchConvTranspose(24, phase_decomposed=True).apply(variables, x)
    assert got.shape == ref.shape == (3, 16, 16, 24)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
