"""Golden tests: SDF decoders vs the PyTorch reference, via weight conversion."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from alignsdf_tpu.config import NetworkSpecs
from alignsdf_tpu.models.decoder import CombinedDecoder, SeparateDecoder
from alignsdf_tpu.models import torch_import

import oracle

torch = pytest.importorskip("torch")

NS = NetworkSpecs()  # canonical 30k_1e2d_mlp5.json settings
LATENT = 256


def _ref_arch():
    oracle.setup_reference()
    import networks.model as arch

    return arch


def _inputs(latent, pfs, n=64, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(n, latent + pfs).astype(np.float32)


@pytest.mark.parametrize("use_classifier", [False, True])
def test_combined_decoder_matches_reference(use_classifier):
    arch = _ref_arch()
    pfs = 3
    torch_dec = arch.CombinedDecoder(
        LATENT, pfs, "nerf",
        dims=list(NS.dims), dropout=list(NS.dropout), dropout_prob=NS.dropout_prob,
        norm_layers=list(NS.norm_layers), latent_in=list(NS.latent_in),
        num_class=NS.num_class, xyz_in_all=NS.xyz_in_all, use_tanh=NS.use_tanh,
        latent_dropout=NS.latent_dropout, weight_norm=NS.weight_norm,
        use_classifier=use_classifier,
    ).eval()

    x = _inputs(LATENT, pfs)
    with torch.no_grad():
        t_hand, t_obj, t_cls = torch_dec(torch.from_numpy(x))

    jax_dec = CombinedDecoder(LATENT, pfs, "nerf", NS, use_classifier=use_classifier)
    params = {"params": torch_import.convert_combined_decoder(
        torch_dec.state_dict(), NS, use_classifier)}
    j_hand, j_obj, j_cls = jax_dec.apply(params, jnp.asarray(x))

    np.testing.assert_allclose(np.asarray(j_hand), t_hand.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_obj), t_obj.numpy(), atol=1e-5)
    if use_classifier:
        np.testing.assert_allclose(np.asarray(j_cls), t_cls.numpy(), atol=1e-5)


@pytest.mark.parametrize("encode_style,pfs", [
    ("nerf", 3), ("nerf", 39), ("hand", 6), ("hand", 51), ("obj", 6), ("both", 9),
])
def test_separate_decoder_matches_reference(encode_style, pfs):
    arch = _ref_arch()
    torch_dec = arch.SeparateDecoder(
        LATENT, pfs, encode_style,
        dims=list(NS.dims), dropout=list(NS.dropout), dropout_prob=NS.dropout_prob,
        norm_layers=list(NS.norm_layers), latent_in=list(NS.latent_in),
        num_class=NS.num_class, xyz_in_all=NS.xyz_in_all, use_tanh=NS.use_tanh,
        latent_dropout=NS.latent_dropout, weight_norm=NS.weight_norm,
        use_classifier=False,
    ).eval()

    x = _inputs(LATENT, pfs, seed=hash(encode_style) % 1000)
    with torch.no_grad():
        t_hand, t_obj, _ = torch_dec(torch.from_numpy(x))

    jax_dec = SeparateDecoder(LATENT, pfs, encode_style, NS, use_classifier=False)
    params = {"params": torch_import.convert_separate_decoder(
        torch_dec.state_dict(), NS, False)}
    j_hand, j_obj, _ = jax_dec.apply(params, jnp.asarray(x))

    np.testing.assert_allclose(np.asarray(j_hand), t_hand.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_obj), t_obj.numpy(), atol=1e-5)


def test_separate_decoder_layernorm_variant():
    """weight_norm=False path: LayerNorm at norm_layers (reference networks/model.py:254-255,272-273)."""
    arch = _ref_arch()
    ns = NetworkSpecs(weight_norm=False, dropout=())
    torch_dec = arch.SeparateDecoder(
        LATENT, 3, "nerf",
        dims=list(ns.dims), dropout=None, dropout_prob=0.0,
        norm_layers=list(ns.norm_layers), latent_in=list(ns.latent_in),
        num_class=ns.num_class, xyz_in_all=False, use_tanh=False,
        latent_dropout=False, weight_norm=False, use_classifier=False,
    ).eval()

    x = _inputs(LATENT, 3, seed=7)
    with torch.no_grad():
        t_hand, t_obj, _ = torch_dec(torch.from_numpy(x))

    jax_dec = SeparateDecoder(LATENT, 3, "nerf", ns, use_classifier=False)
    params = {"params": torch_import.convert_separate_decoder(
        torch_dec.state_dict(), ns, False)}
    j_hand, j_obj, _ = jax_dec.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(j_hand), t_hand.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_obj), t_obj.numpy(), atol=1e-5)


def test_decoder_dropout_train_mode_runs():
    jax_dec = SeparateDecoder(LATENT, 3, "nerf", NS, use_classifier=False)
    x = jnp.asarray(_inputs(LATENT, 3))
    variables = jax_dec.init(jax.random.PRNGKey(0), x)
    h1, o1, _ = jax_dec.apply(
        variables, x, train=True, dropout_rng=jax.random.PRNGKey(1))
    h2, o2, _ = jax_dec.apply(
        variables, x, train=True, dropout_rng=jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(h1), np.asarray(h2))  # dropout active
    h3, *_ = jax_dec.apply(variables, x)
    assert np.isfinite(np.asarray(h3)).all()
