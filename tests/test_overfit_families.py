"""Proof-of-learning for the NON-flagship config families (VERDICT r4 item 2):

- pixel-align: gradients flow through bicubic feature sampling into the
  HeadNet map and through the projection into the MANO root (reference
  utils/utils.py:536-558 inside train.py:464-626);
- classifier: the CE hand-part loss (reference train.py:572-581) learns the
  geometric dataset's analytic sextant labels to accuracy >> 1/6 chance.

CPU-sized versions of the real-chip runs recorded in BASELINE.md round 5.
Marked slow: deselect with `-m "not slow"`.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from alignsdf_tpu.config import LearningRateSchedule, NetworkSpecs, Specs
from alignsdf_tpu.data.dataset import SDFDataset, collate, to_train_batch
from alignsdf_tpu.data.synthetic import (
    geometric_part_label,
    geometric_scene_params,
    write_geometric_dataset,
)
from alignsdf_tpu.models.alignsdf import build_model, full_variables
from alignsdf_tpu.training.train_state import make_optimizer
from alignsdf_tpu.training.train_step import init_train_state, make_train_step


def _setup(tmp_path, n_scenes=4, **spec_kw):
    keys = [f"{i:04d}" for i in range(n_scenes)]
    base = write_geometric_dataset(str(tmp_path), keys, n_points=4000,
                                   image_hw=64)
    kw = dict(
        model_type="1encoder2decoder", encode_style="both",
        point_feat_size=9, latent_size=32, sdf_scale_factor=7.0186,
        samples_per_scene=128, image_size=(64, 64), mano_branch=True,
        object_pose_branch=True, disable_aug=True,
        additional_loss_start=100000,
        network_specs=NetworkSpecs(dims=(128,) * 4, latent_in=(2,)),
        lr_schedules=(LearningRateSchedule(initial=1e-3),),
        dataset="obman", data_source=str(tmp_path))
    kw.update(spec_kw)
    specs = Specs(**kw)
    ds = SDFDataset(specs, keys, data_root=base)
    model = build_model(specs)
    opt = make_optimizer(specs)
    items = [ds.__getitem__(i, seed=100 + i) for i in range(len(keys))]
    batch = {k: jnp.asarray(v) for k, v in
             to_train_batch(specs, collate(items)).items() if k != "key"}
    return keys, ds, specs, model, opt, batch


def _healthy_state(model, specs, opt, batch):
    cond = {k: batch[k] for k in ("cam_intr", "mano_root",
                                  "rest_obj_corners")}
    for s in range(10):
        cand = init_train_state(model, specs, jax.random.PRNGKey(s), opt)
        h0, o0, *_ = model.apply(
            full_variables(model, cand.params, cand.batch_stats),
            batch["image"], batch["xyz"], cond)
        if abs(float(jnp.mean(h0))) < 0.03 and abs(float(jnp.mean(o0))) < 0.03:
            return cand
    pytest.fail("no healthy init in 10 seeds")


def _train(model, specs, opt, state, ds, keys, batch, steps=600,
           advance_epoch=False):
    step = jax.jit(make_train_step(model, specs, opt, None),
                   donate_argnums=(0,))
    rng = jax.random.PRNGKey(1)
    first = last = None
    for i in range(steps):
        if advance_epoch:
            # one epoch per step so additional_loss_start gates mid-run
            # (the CE classifier loss only activates past the gate,
            # reference train.py:556-558)
            state = state.replace(epoch=jnp.asarray(i + 1, jnp.int32))
        if i % 25 == 0 and i:
            items = [ds.__getitem__(j, seed=1000 + 31 * i + j)
                     for j in range(len(keys))]
            batch = {k: jnp.asarray(v) for k, v in
                     to_train_batch(specs, collate(items)).items()
                     if k != "key"}
        state, losses = step(state, batch, jax.random.fold_in(rng, i))
        if i == 0:
            first = {k: float(v) for k, v in losses.items()}
        last = losses
    return state, first, {k: float(v) for k, v in last.items()}, batch


@pytest.mark.slow
def test_pixel_align_family_learns(tmp_path):
    keys, ds, specs, model, opt, batch = _setup(tmp_path, pixel_align=True)
    state = _healthy_state(model, specs, opt, batch)
    state, first, last, batch = _train(model, specs, opt, state, ds, keys,
                                       batch)
    # the pixel family conditions the decoder on per-point image features:
    # sdf losses and the joint loss (via the projection root) must descend
    assert last["hand_sdf"] < 0.4 * first["hand_sdf"], (first, last)
    assert last["obj_sdf"] < 0.55 * first["obj_sdf"], (first, last)
    assert last["joint"] < first["joint"], (first, last)

    # reconstruct scene 0 through the production grid path (XLA pixel
    # sampling on CPU) and check the surface sits at the voxel floor
    from alignsdf_tpu.geom.marching_cubes import marching_cubes
    from alignsdf_tpu.inference.reconstruct import Reconstructor

    scene = geometric_scene_params(keys[0])
    variables = full_variables(model, state.params, state.batch_stats)
    recon = Reconstructor(model, variables, specs, cube_dim=48, mesh=None)
    pending = recon.submit({
        "image": np.asarray(batch["image"][0]),
        "cam_intr": np.asarray(batch["cam_intr"][0]),
        "mano_root": np.asarray(scene["root"]),
        "rest_obj_corners": np.asarray(batch["rest_obj_corners"][0]),
    })
    res = pending["grid"]
    origin = np.asarray(res.origin)
    voxel = float(res.voxel_size)
    voxel_m = voxel * 2.0 / specs.sdf_scale_factor
    verts, _ = marching_cubes(np.asarray(res.sdf_hand), 0.0)
    v_work = ((verts * voxel + origin) * 2.0 / specs.sdf_scale_factor
              + scene["root"])
    dist = np.abs(np.linalg.norm(v_work - scene["root"], axis=1)
                  - float(scene["hand_radius"]))
    assert dist.mean() < 1.5 * voxel_m, (dist.mean(), voxel_m)


@pytest.mark.slow
def test_classifier_family_learns_labels(tmp_path):
    keys, ds, specs, model, opt, batch = _setup(
        tmp_path, classifier_branch=True, classifier_weight=0.5,
        additional_loss_start=250,
        network_specs=NetworkSpecs(dims=(128,) * 4, latent_in=(2,),
                                   num_class=6))
    # labels reach the train batch nontrivially through the production loader
    lab = np.asarray(batch["labels"])
    sup = lab[lab >= 0]
    assert len(sup) > 100 and len(np.unique(sup)) == 6

    state = _healthy_state(model, specs, opt, batch)
    state, first, last, batch = _train(model, specs, opt, state, ds, keys,
                                       batch, steps=700, advance_epoch=True)
    # CE active past the 250-step gate and converged by the end
    assert last["cls"] > 0 and last["cls"] < 0.2, (first, last)

    # point-level accuracy at supervised samples >> chance (1/6)
    cond = {k: batch[k] for k in ("cam_intr", "mano_root",
                                  "rest_obj_corners")}
    _, _, logits, *_ = model.apply(
        full_variables(model, state.params, state.batch_stats),
        batch["image"], batch["xyz"], cond)
    lab = np.asarray(batch["labels"])
    pred = np.asarray(jnp.argmax(logits, axis=-1))
    m = lab >= 0
    acc = float((pred[m] == lab[m]).mean())
    assert acc > 0.5, acc

    # vertex-level: re-query labels at reconstructed hand-mesh vertices
    # (reference utils/mesh.py:137-184) and compare with the analytic
    # sextant of the vertex direction
    from alignsdf_tpu.geom.marching_cubes import marching_cubes
    from alignsdf_tpu.inference.reconstruct import Reconstructor

    scene = geometric_scene_params(keys[0])
    variables = full_variables(model, state.params, state.batch_stats)
    recon = Reconstructor(model, variables, specs, cube_dim=48, mesh=None)
    pending = recon.submit({
        "image": np.asarray(batch["image"][0]),
        "cam_intr": np.asarray(batch["cam_intr"][0]),
        "mano_root": np.asarray(scene["root"]),
        "rest_obj_corners": np.asarray(batch["rest_obj_corners"][0]),
    })
    res = pending["grid"]
    verts, _ = marching_cubes(np.asarray(res.sdf_hand), 0.0)
    v_dec = verts * float(res.voxel_size) + np.asarray(res.origin)
    pred_lab = recon._query_labels(pending["ctx"], v_dec).astype(int)
    v_work = v_dec * 2.0 / specs.sdf_scale_factor + scene["root"]
    gt_lab = geometric_part_label(v_work, scene["root"]).astype(int)
    acc_v = float((pred_lab == gt_lab).mean())
    assert acc_v > 0.5, acc_v
