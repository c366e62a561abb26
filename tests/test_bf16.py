"""Mixed-precision (Specs.compute_dtype='bfloat16') invariants.

The bf16 policy (models/layers.py, models/resnet.py, models/decoder.py) casts
matmul/conv operands down while keeping parameters, BatchNorm statistics, the
MANO kinematics, the object-pose solve, and every loss in float32.  These
tests pin the invariants; full f32 bit-parity against the PyTorch reference
is covered by the golden tests (compute_dtype default is float32 and all
casts are then no-ops).
"""

import jax
import jax.numpy as jnp
import pytest

from alignsdf_tpu.config import NetworkSpecs, Specs
from alignsdf_tpu.data.synthetic import synthetic_train_batch
from alignsdf_tpu.models.alignsdf import build_model
from alignsdf_tpu.training.train_state import make_optimizer
from alignsdf_tpu.training.train_step import init_train_state, make_train_step


def _specs(dtype: str) -> Specs:
    return Specs(
        dataset="obman",
        sdf_scale_factor=7.018621123357809,
        mano_branch=True,
        object_pose_branch=True,
        encode_style="both",
        point_feat_size=9,
        penetration_loss=True,
        contact_loss=True,
        scenes_per_batch=2,
        samples_per_scene=32,
        image_size=(64, 64),
        network_specs=NetworkSpecs(),
        compute_dtype=dtype,
    )


def _run_step(dtype: str):
    specs = _specs(dtype)
    model = build_model(specs)
    opt = make_optimizer(specs)
    state = init_train_state(
        model, specs, jax.random.PRNGKey(0), opt, batch_size=2, n_points=8
    )
    step = jax.jit(make_train_step(model, specs, opt))
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_train_batch(specs, batch_size=2).items()
    }
    new_state, losses = step(state, batch, jax.random.PRNGKey(1))
    return new_state, {k: float(v) for k, v in losses.items()}


def test_bf16_train_step_matches_f32_and_keeps_f32_state():
    _, losses_f32 = _run_step("float32")
    state_bf16, losses_bf16 = _run_step("bfloat16")

    # identical params/batch: the bf16 step must land within bf16 rounding of
    # the f32 step on every loss term
    for key, ref in losses_f32.items():
        got = losses_bf16[key]
        assert got == pytest.approx(ref, rel=0.05, abs=1e-4), key

    # parameters, optimizer state, and BN running stats must remain float32
    for tree in (state_bf16.params, state_bf16.batch_stats, state_bf16.opt_state):
        for leaf in jax.tree.leaves(tree):
            if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
                assert leaf.dtype == jnp.float32


def test_bf16_forward_outputs_are_f32():
    specs = _specs("bfloat16")
    model = build_model(specs)
    opt = make_optimizer(specs)
    state = init_train_state(
        model, specs, jax.random.PRNGKey(0), opt, batch_size=2, n_points=8
    )
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_train_batch(specs, batch_size=2).items()
    }
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    if state.consts:
        variables["consts"] = state.consts
    sdf_hand, sdf_obj, pred_class, mano_results, obj_results = model.apply(
        variables,
        batch["image"],
        batch["xyz"],
        {
            "cam_intr": batch["cam_intr"],
            "mano_root": batch["mano_root"],
            "rest_obj_corners": batch["rest_obj_corners"],
        },
        train=False,
    )
    assert sdf_hand.dtype == jnp.float32
    assert sdf_obj.dtype == jnp.float32
    # pose/kinematics branches are pinned to f32
    assert mano_results["joints"].dtype == jnp.float32
    assert obj_results["obj_trans"].dtype == jnp.float32
    assert jnp.all(jnp.isfinite(sdf_hand)) and jnp.all(jnp.isfinite(sdf_obj))
