"""The jitted SPMD training step.

Data parallelism is expressed the TPU-native way: one ``jax.jit`` over a
``Mesh`` with the batch dimension sharded along the ``data`` axis and
parameters replicated.  GSPMD inserts the gradient all-reduce (fused into the
backward schedule over ICI) and computes *global* BatchNorm statistics —
exactly reproducing reference DDP + SyncBatchNorm (reference
train.py:398,350,583) without any explicit collectives.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from alignsdf_tpu.config import Specs
from alignsdf_tpu.models.alignsdf import AlignSDF
from alignsdf_tpu.training.losses import compute_losses
from alignsdf_tpu.training.train_state import (
    TrainState,
    learning_rate_for_epoch,
    make_optimizer,
)


def build_batch_masks(specs: Specs, batch_size: int, additional_active,
                      is_hand=None) -> Tuple:
    """Per-point hand/obj loss masks (reference train.py:467-487).

    Sample layout along the point axis is [hand-half | obj-half] per scene.
    Before AdditionalLossStart (or with ignore_other), each branch only sees
    its own points; after, hand loss covers all points and obj loss covers all.

    ``is_hand``: optional (B*N,) per-point hand indicator replacing the
    positional layout — emitted by the loader when it reorders points for
    the banded pixel kernel (data/pixel_sort.pixel_row_sort_batch).
    """
    n = specs.samples_per_scene
    half = n // 2
    total = batch_size * n

    if specs.hand_branch and specs.obj_branch:
        if is_hand is not None:
            early_hand = is_hand.reshape(total, 1).astype(jnp.float32)
            early_obj = 1.0 - early_hand
        else:
            per_scene_hand = jnp.concatenate(
                [jnp.ones(half), jnp.zeros(n - half)])
            early_hand = jnp.tile(per_scene_hand, batch_size).reshape(total, 1)
            per_scene_obj = jnp.concatenate(
                [jnp.zeros(half), jnp.ones(n - half)])
            early_obj = jnp.tile(per_scene_obj, batch_size).reshape(total, 1)
        ones = jnp.ones((total, 1))
        if specs.ignore_point_from_other_mesh:
            return early_hand, early_obj
        active = jnp.asarray(additional_active, jnp.float32)
        mask_hand = early_hand * (1 - active) + ones * active
        mask_obj = early_obj * (1 - active) + ones * active
        return mask_hand, mask_obj
    ones = jnp.ones((total, 1))
    return ones, ones


def make_train_step(model: AlignSDF, specs: Specs,
                    optimizer: optax.GradientTransformation,
                    decoder_override=None):
    """Build the pure train-step function (jit it with appropriate shardings).

    ``decoder_override``: optional fused decoder
    ``decode(decoder_params, inputs, seed, train) -> (sdf_h, sdf_o, logits)``
    (ops/decoder_train_kernel.make_fused_train_decoder) replacing the XLA
    decoder forward+backward; the rest of the model stays on XLA."""

    def train_step(state: TrainState, batch: Dict[str, jax.Array], rng: jax.Array):
        additional_active = (state.epoch >= specs.additional_loss_start).astype(jnp.float32)
        batch_size = batch["image"].shape[0]
        mask_hand, mask_obj = build_batch_masks(
            specs, batch_size, additional_active, batch.get("point_is_hand"))

        loss_batch = dict(batch)
        loss_batch["mask_hand"] = mask_hand
        loss_batch["mask_obj"] = mask_obj

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            if state.consts:
                variables["consts"] = state.consts
            cond = {
                "cam_intr": batch["cam_intr"],
                "mano_root": batch["mano_root"],
                "rest_obj_corners": batch["rest_obj_corners"],
            }
            if decoder_override is None:
                outputs, mutated = model.apply(
                    variables, batch["image"], batch["xyz"], cond,
                    train=True, dropout_rng=rng, mutable=["batch_stats"],
                )
            elif getattr(decoder_override, "pixel", False):
                # pixel-align kernel: the HeadNet feature map stays (B, Hf,
                # Wf, C); bicubic sampling happens inside the decoder kernel
                # (ops/decoder_train_pixel), the projection in plain jnp here
                (fmap, emb, mano_results, obj_results), mutated = model.apply(
                    variables, batch["image"], batch["xyz"], cond,
                    train=True, mutable=["batch_stats"],
                    method=model.decoder_inputs_pixel,
                )
                seed = jax.random.randint(rng, (), 0, jnp.iinfo(jnp.int32).max)
                sdf_hand, sdf_obj, logits = decoder_override(
                    params["decoder"], fmap, emb, batch["xyz"],
                    batch["cam_intr"], mano_results["joints"][:, 0:1],
                    seed, train=True)
                outputs = (sdf_hand, sdf_obj, logits, mano_results, obj_results)
            elif getattr(decoder_override, "factored", False):
                # scene-factored kernel: latent stays (B, ls); it is folded
                # into per-scene biases inside the decode fn, never broadcast
                # into per-point rows (ops/decoder_train_kernel)
                (latent, emb, mano_results, obj_results), mutated = model.apply(
                    variables, batch["image"], batch["xyz"], cond,
                    train=True, mutable=["batch_stats"],
                    method=model.decoder_inputs_factored,
                )
                seed = jax.random.randint(rng, (), 0, jnp.iinfo(jnp.int32).max)
                sdf_hand, sdf_obj, logits = decoder_override(
                    params["decoder"], latent, emb, seed, train=True)
                outputs = (sdf_hand, sdf_obj, logits, mano_results, obj_results)
            else:
                (dec_in, mano_results, obj_results), mutated = model.apply(
                    variables, batch["image"], batch["xyz"], cond,
                    train=True, mutable=["batch_stats"],
                    method=model.decoder_inputs,
                )
                seed = jax.random.randint(rng, (), 0, jnp.iinfo(jnp.int32).max)
                sdf_hand, sdf_obj, logits = decoder_override(
                    params["decoder"], dec_in, seed, train=True)
                outputs = (sdf_hand, sdf_obj, logits, mano_results, obj_results)
            losses = compute_losses(specs, outputs, loss_batch, additional_active)
            return losses["total"], (losses, mutated["batch_stats"])

        (loss, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        if specs.freeze == "bn":
            # momentum-0 BN-stat freeze (reference networks/model.py:24-30):
            # normalization used batch stats above; running buffers unchanged
            new_stats = state.batch_stats

        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        lr = learning_rate_for_epoch(specs, state.epoch)
        updates = jax.tree.map(lambda u: u * lr, updates)
        new_params = optax.apply_updates(state.params, updates)

        new_state = state.replace(
            params=new_params, batch_stats=new_stats, opt_state=new_opt_state
        )
        return new_state, losses

    return train_step


def make_multi_step(train_step, k: int):
    """Chain ``k`` train steps into ONE jitted call with ``lax.scan`` over a
    stacked batch (leading axis k) and stacked rng keys.

    One dispatch per k steps keeps host-dispatch latency off the step path —
    microseconds on a directly-attached host, but ~3 ms/step through this
    sandbox's TPU relay (BASELINE.md).  Semantically identical to k
    sequential ``train_step`` calls: same updates, same dropout keys, same
    final state; per-step losses come back stacked (k,) for logging.
    """

    def multi(state: TrainState, batches: Dict[str, jax.Array],
              rngs: jax.Array):
        def body(st, xs):
            b, key = xs
            st, losses = train_step(st, b, key)
            return st, losses

        return jax.lax.scan(body, state, (batches, rngs))

    return multi


def init_prediction_means(model, specs: Specs, state: "TrainState",
                          batch_size: int = 2, seed: int = 17):
    """Mean init-time hand/obj SDF predictions on a synthetic probe batch,
    evaluated on CPU.

    The clamp dead-zone detector: the torch-faithful init draws the decoder
    final-layer bias from U(+-1/sqrt(in)) ~ +-0.044 at width 512, and an
    unlucky draw starts ALL predictions in/past the 0.05 clamp band, where
    the clamped-L1 sdf loss has ZERO gradient — the loss freezes bit-exactly
    (hazard analysis in BASELINE.md round 4; the reference's torch init has
    the identical roulette, reference train.py:333-369 + deep_sdf clamp)."""
    from alignsdf_tpu.data.synthetic import synthetic_train_batch
    from alignsdf_tpu.models.alignsdf import full_variables

    batch = synthetic_train_batch(specs, batch_size=batch_size, seed=seed)
    cond = {k: jnp.asarray(batch[k]) for k in
            ("cam_intr", "mano_root", "rest_obj_corners")}
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    ctx = jax.default_device(cpu) if (
        cpu is not None and jax.default_backend() != "cpu") else None
    variables = full_variables(model, state.params, state.batch_stats)

    def run():
        h0, o0, *_ = model.apply(variables, jnp.asarray(batch["image"]),
                                 jnp.asarray(batch["xyz"]), cond)
        return (float(jnp.mean(h0)) if h0 is not None else 0.0,
                float(jnp.mean(o0)) if o0 is not None else 0.0)

    if ctx is not None:
        with ctx:
            return run()
    return run()


def healthy_init_train_state(
    model: AlignSDF,
    specs: Specs,
    rng: jax.Array,
    optimizer: optax.GradientTransformation,
    max_tries: int = 25,
):
    """init_train_state with the clamp dead-zone guard: re-draw the init
    until the mean probe prediction of both branches sits safely INSIDE the
    clamp band (|mean| < 0.6 * ClampingDistance — the criterion the round-4
    overfit proof validated), so a fresh `cli/train` run can't silently
    start with a bit-frozen sdf loss.

    Returns (state, tries).  Raises RuntimeError if no healthy draw is found
    in ``max_tries`` (override with --no_init_guard)."""
    clamp = specs.clamping_distance
    threshold = 0.6 * clamp if clamp else None
    last = None
    for t in range(max_tries):
        cand = init_train_state(model, specs, jax.random.fold_in(rng, t)
                                if t else rng, optimizer)
        if threshold is None:
            return cand, 1
        mh, mo = init_prediction_means(model, specs, cand)
        last = (mh, mo)
        if abs(mh) < threshold and abs(mo) < threshold:
            return cand, t + 1
    raise RuntimeError(
        f"no healthy init in {max_tries} draws (last probe means {last}, "
        f"threshold {threshold}): every draw starts the decoder in the "
        f"{clamp} clamp's zero-gradient dead zone. Use a pretrained warm "
        "start (tools/import_backbone.py) or --no_init_guard to proceed.")


def init_train_state(
    model: AlignSDF,
    specs: Specs,
    rng: jax.Array,
    optimizer: optax.GradientTransformation,
    batch_size: int = 2,
    n_points: int = 8,
) -> TrainState:
    """Initialize parameters with tiny dummy shapes (shapes don't affect params)."""
    dummy_img = jnp.zeros((batch_size, specs.image_size[0], specs.image_size[1], 3))
    dummy_xyz = jnp.zeros((batch_size * n_points, 3))
    dummy_cond = {
        "cam_intr": jnp.zeros((batch_size, 3, 4)),
        "mano_root": jnp.zeros((batch_size, 3)),
        "rest_obj_corners": jnp.zeros((batch_size, 8, 3)),
    }
    # Run the init trace on CPU: on the axon TPU tunnel a full init forward
    # pays a multi-minute first-execution warmup; parameters are tiny and
    # move to the default device lazily on first use.
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    if cpu is not None and jax.default_backend() != "cpu":
        with jax.default_device(cpu):
            variables = model.init(rng, dummy_img, dummy_xyz, dummy_cond)
    else:
        variables = model.init(rng, dummy_img, dummy_xyz, dummy_cond)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    consts = variables.get("consts", {})
    opt_state = optimizer.init(params)
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        consts=consts,
        opt_state=opt_state,
        epoch=jnp.asarray(1, jnp.int32),
    )
