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
            block["shortcut"] = {
                "kernel": sd[f"block_{i}.shortcut.weight"].numpy().T}
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


def test_pointnet_gradients_finite():
    net = ResnetPointnet(c_dim=128, hidden_dim=128)
    p = jnp.asarray(_points(batch=2, t=32, seed=2))
    params = net.init(jax.random.PRNGKey(0), p)["params"]

    def loss(params):
        return jnp.sum(net.apply({"params": params}, p) ** 2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree.leaves(grads)
    assert leaves and all(np.isfinite(np.asarray(g)).all() for g in leaves)
