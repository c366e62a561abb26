"""Golden tests: PointNet encoders vs the PyTorch reference
(networks/pointnet.py:58-157 — shipped upstream but never wired in; here they
are first-class encoders, so they get the same weight-conversion parity
treatment as the rest of the model zoo)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from alignsdf_tpu.models.pointnet import ResnetPointnet, SimplePointnet
from alignsdf_tpu.models.torch_import import linear_params

import oracle

torch = pytest.importorskip("torch")


def _points(batch=4, t=100, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(batch, t, 3).astype(np.float32)


def _convert_simple(sd):
    return {
        name: linear_params(sd, name)
        for name in ("fc_pos", "fc_0", "fc_1", "fc_2", "fc_3", "fc_c")
    }


def _convert_resnet(sd):
    params = {"fc_pos": linear_params(sd, "fc_pos"),
              "fc_c": linear_params(sd, "fc_c")}
    for i in range(5):
        block = {
            "fc_0": linear_params(sd, f"block_{i}.fc_0"),
            "fc_1": linear_params(sd, f"block_{i}.fc_1"),
        }
        if f"block_{i}.shortcut.weight" in sd:
            block["shortcut"] = linear_params(sd, f"block_{i}.shortcut")
        params[f"block_{i}"] = block
    return params


def test_simple_pointnet_matches_reference():
    oracle.setup_reference()
    import networks.pointnet as ref

    torch_net = ref.SimplePointnet(c_dim=128, dim=3, hidden_dim=128).eval()
    p = _points()
    with torch.no_grad():
        expected = torch_net(torch.from_numpy(p)).numpy()

    net = SimplePointnet(c_dim=128, hidden_dim=128)
    out = net.apply({"params": _convert_simple(torch_net.state_dict())},
                    jnp.asarray(p))
    assert out.shape == (4, 128)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_resnet_pointnet_matches_reference():
    oracle.setup_reference()
    import networks.pointnet as ref

    torch_net = ref.ResnetPointnet(c_dim=128, dim=3, hidden_dim=128).eval()
    p = _points(seed=1)
    with torch.no_grad():
        expected = torch_net(torch.from_numpy(p)).numpy()

    net = ResnetPointnet(c_dim=128, hidden_dim=128)
    out = net.apply({"params": _convert_resnet(torch_net.state_dict())},
                    jnp.asarray(p))
    assert out.shape == (4, 128)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_pointnet_backbone_full_model():
    """``Backbone: resnet_pointnet`` through build_model/make_encoder: the full
    AlignSDF forward matches the composition of the reference ResnetPointnet
    (networks/pointnet.py:107-157) and SeparateDecoder with converted weights
    (the reference ships the encoders unwired, so the composition is assembled
    here the same way get_encoder would)."""
    oracle.setup_reference()
    import networks.pointnet as refpn
    import networks.model as arch

    from alignsdf_tpu.config import specs_from_dict
    from alignsdf_tpu.models.alignsdf import build_model
    from alignsdf_tpu.models.torch_import import convert_separate_decoder

    ns = {
        "dims": [64, 64, 64, 64], "dropout": [0, 1], "dropout_prob": 0.2,
        "norm_layers": [0, 1, 2, 3], "latent_in": [2], "num_class": 6,
        "xyz_in_all": False, "use_tanh": False, "latent_dropout": False,
        "weight_norm": True,
    }
    specs_dict = {
        "Dataset": "obman", "ModelType": "1encoder2decoder",
        "Backbone": "resnet_pointnet", "LatentSize": 32,
        "PointFeatSize": 3, "EncodeStyle": "nerf", "SamplesPerScene": 16,
        "HandBranch": True, "ObjectBranch": True, "NetworkSpecs": ns,
    }
    specs = specs_from_dict(specs_dict)
    model = build_model(specs)

    torch.manual_seed(0)
    t_encoder = refpn.ResnetPointnet(c_dim=32, dim=3, hidden_dim=128).eval()
    t_decoder = arch.SeparateDecoder(32, 3, "nerf", **ns,
                                     use_classifier=False).eval()

    batch, n = 2, 16
    rng = np.random.RandomState(0)
    img = rng.rand(batch, 8, 8, 3).astype(np.float32)  # batch-size carrier only
    xyz = (rng.randn(batch * n, 3) * 0.5).astype(np.float32)
    with torch.no_grad():
        lat = t_encoder(torch.from_numpy(xyz.reshape(batch, n, 3)))
        inputs = torch.cat(
            [lat.repeat_interleave(n, dim=0), torch.from_numpy(xyz)], dim=1)
        t_hand, t_obj, _ = t_decoder(inputs)

    params = {
        "encoder": {"pointnet": _convert_resnet(t_encoder.state_dict())},
        "decoder": convert_separate_decoder(
            t_decoder.state_dict(), specs.network_specs, False),
    }
    cond = {
        "cam_intr": jnp.zeros((batch, 3, 4)),
        "mano_root": jnp.zeros((batch, 3)),
        "rest_obj_corners": jnp.zeros((batch, 8, 3)),
    }
    j_hand, j_obj, _, j_mano, j_objres = model.apply(
        {"params": params}, jnp.asarray(img), jnp.asarray(xyz), cond,
        train=False)
    assert j_mano is None and j_objres is None
    np.testing.assert_allclose(np.asarray(j_hand), t_hand.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(j_obj), t_obj.numpy(), atol=2e-5)


def test_pointnet_backbone_rejects_image_branches():
    from alignsdf_tpu.models.resnet import make_encoder

    with pytest.raises(ValueError, match="resnet backbone"):
        make_encoder("pointnet", 128, mano_features=True, use_headnet=False,
                     use_pixel_align=False)


def test_pointnet_gradients_finite():
    net = ResnetPointnet(c_dim=128, hidden_dim=128)
    p = jnp.asarray(_points(batch=2, t=32, seed=2))
    params = net.init(jax.random.PRNGKey(0), p)["params"]

    def loss(params):
        return jnp.sum(net.apply({"params": params}, p) ** 2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree.leaves(grads)
    assert leaves and all(np.isfinite(np.asarray(g)).all() for g in leaves)
