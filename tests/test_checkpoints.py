"""Checkpoint layout / atomicity / warm-start tests
(reference utils/misc.py:118-135, train.py:105-130,406-409 semantics)."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from alignsdf_tpu.config import NetworkSpecs, Specs
from alignsdf_tpu.models.alignsdf import build_model
from alignsdf_tpu.training import checkpoints as ckpt
from alignsdf_tpu.training.train_state import make_optimizer
from alignsdf_tpu.training.train_step import init_train_state

SMALL_NS = NetworkSpecs(dims=(32, 32, 32, 32), dropout=(0,), norm_layers=(0, 1),
                        latent_in=(2,))


def _state(latent=16, backbone="resnet18"):
    specs = Specs(latent_size=latent, samples_per_scene=8, image_size=(64, 64),
                  network_specs=SMALL_NS, backbone=backbone, dataset="obman")
    model = build_model(specs)
    opt = make_optimizer(specs)
    return specs, init_train_state(model, specs, jax.random.PRNGKey(0), opt)


def test_save_restore_two_directory_layout(tmp_path):
    specs, state = _state()
    exp = str(tmp_path / "exp")
    ckpt.save_checkpoint(exp, state, epoch=7, name="latest")

    # reference layout: params and optimizer in separate subdirs
    assert os.path.isdir(os.path.join(exp, "ModelParameters", "latest"))
    assert os.path.isdir(os.path.join(exp, "OptimizerParameters", "latest"))
    assert ckpt.checkpoint_exists(exp)

    _, fresh = _state()
    restored, epoch = ckpt.restore_checkpoint(exp, fresh)
    assert epoch == 7
    a = jax.tree.leaves(state.params)
    b = jax.tree.leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    for x, y in zip(jax.tree.leaves(state.opt_state),
                    jax.tree.leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_resave_keeps_previous_until_swap(tmp_path):
    """Saving over an existing name must go through tmp+rename, never
    rmtree-then-save (a crash mid-save must not destroy the resume point)."""
    specs, state = _state()
    exp = str(tmp_path / "exp")
    ckpt.save_checkpoint(exp, state, epoch=1)
    ckpt.save_checkpoint(exp, state, epoch=2)
    _, fresh = _state()
    _, epoch = ckpt.restore_checkpoint(exp, fresh)
    assert epoch == 2
    # no stale tmp/old directories left behind
    leftovers = [d for d in os.listdir(os.path.join(exp, "ModelParameters"))
                 if d != "latest"]
    assert leftovers == []


def test_warm_start_merges_by_name(tmp_path):
    """Spec Resume semantics: non-strict merge — matching leaves load,
    mismatched/missing leaves keep their initialized values."""
    specs, donor = _state(latent=16)
    exp = str(tmp_path / "donor")
    ckpt.save_checkpoint(exp, donor, epoch=5)

    # same config -> everything loads
    _, fresh = _state(latent=16)
    merged = ckpt.warm_start(fresh, exp)
    for x, y in zip(jax.tree.leaves(donor.params), jax.tree.leaves(merged.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # different latent -> decoder input layers mismatch but everything else
    # (encoder trunk) still loads; no exception (strict=False)
    specs32, fresh32 = _state(latent=24)
    merged32 = ckpt.warm_start(fresh32, exp)
    enc_a = donor.params["encoder"]["conv1"]["kernel"]
    enc_b = merged32.params["encoder"]["conv1"]["kernel"]
    np.testing.assert_array_equal(np.asarray(enc_a), np.asarray(enc_b))
    # decoder first layer kept its init (shape differs)
    assert jnp.asarray(
        merged32.params["decoder"]["hand"]["linh0"]["v"]).shape[0] == 24 + 3
