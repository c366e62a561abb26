"""ImageNet-pretrained backbone bootstrap (tools/import_backbone): a
torchvision-shaped ResNet state_dict converts to a warm-start checkpoint that
a FRESH training run picks up through the spec ``Resume`` path — trunk
filters and BN stats land in the train state, heads stay freshly initialized
(reference networks/resnet.py:10-16 + networks/model.py:54-76 semantics)."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from alignsdf_tpu.config import NetworkSpecs, Specs


@pytest.fixture(scope="module")
def torch_resnet18_sd():
    """A torchvision-shaped resnet18 state_dict from the reference's own
    ResNet class (random init — the values don't matter, the key schema and
    shapes are the model-zoo ones)."""
    from tests import oracle

    oracle.setup_reference()
    import networks.resnet as ref_resnet

    model = ref_resnet.resnet18(pretrained=False)
    return {k: v for k, v in model.state_dict().items()
            if k.startswith(("conv1", "bn1", "layer"))}


def test_import_backbone_warm_starts_fresh_run(tmp_path, torch_resnet18_sd):
    import torch

    from tools.import_backbone import convert_backbone, write_warm_start
    from alignsdf_tpu.models.alignsdf import build_model
    from alignsdf_tpu.training import checkpoints as ckpt
    from alignsdf_tpu.training.train_state import make_optimizer
    from alignsdf_tpu.training.train_step import init_train_state

    pth = os.path.join(tmp_path, "resnet18.pth")
    torch.save(torch_resnet18_sd, pth)

    from tools.import_backbone import load_state_dict

    sd = load_state_dict(pth)
    params, stats = convert_backbone(sd, "resnet18")
    out_dir = os.path.join(tmp_path, "imagenet_resnet18")
    write_warm_start(out_dir, params, stats)

    # fresh full-model train state (flagship config shape, tiny image)
    specs = Specs(model_type="1encoder2decoder", encode_style="both",
                  point_feat_size=9, latent_size=64, mano_branch=True,
                  object_pose_branch=True, image_size=(64, 64),
                  samples_per_scene=16, network_specs=NetworkSpecs(
                      dims=(128, 128, 128, 128), latent_in=(2,)),
                  dataset="obman")
    model = build_model(specs)
    state = init_train_state(model, specs, jax.random.PRNGKey(0),
                             make_optimizer(specs))
    fresh_conv1 = np.asarray(state.params["encoder"]["conv1"]["kernel"])
    fresh_linh0 = np.asarray(state.params["decoder"]["hand"]["linh0"]["v"])

    warmed = ckpt.warm_start(state, out_dir)

    # trunk converted: conv1 matches the torch weights (OIHW -> HWIO)
    want = np.asarray(torch_resnet18_sd["conv1.weight"]).transpose(2, 3, 1, 0)
    got = np.asarray(warmed.params["encoder"]["conv1"]["kernel"])
    np.testing.assert_allclose(got, want, atol=0)
    assert not np.allclose(got, fresh_conv1)
    # BN running stats came along
    np.testing.assert_allclose(
        np.asarray(warmed.batch_stats["encoder"]["layer1_0"]["bn1"]["var"]),
        np.asarray(torch_resnet18_sd["layer1.0.bn1.running_var"]), atol=0)
    # heads untouched: decoder weights keep their fresh init
    np.testing.assert_allclose(
        np.asarray(warmed.params["decoder"]["hand"]["linh0"]["v"]),
        fresh_linh0, atol=0)

    # the warmed state runs a train step (the "fresh run starts from the
    # converted filters" property, end to end)
    from alignsdf_tpu.data.synthetic import synthetic_train_batch
    from alignsdf_tpu.training.train_step import make_train_step

    step = jax.jit(make_train_step(model, specs, make_optimizer(specs), None))
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_train_batch(specs, 2).items()}
    new_state, losses = step(warmed, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(losses["total"]))


def test_npz_roundtrip(tmp_path, torch_resnet18_sd):
    """The .npz input path (torch-free environments) converts identically."""
    from tools.import_backbone import convert_backbone, load_state_dict

    npz = os.path.join(tmp_path, "resnet18.npz")
    np.savez(npz, **{k: np.asarray(v) for k, v in torch_resnet18_sd.items()})
    p1, s1 = convert_backbone(load_state_dict(npz), "resnet18")
    p2, s2 = convert_backbone(torch_resnet18_sd, "resnet18")
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
