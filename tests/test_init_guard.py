"""Clamp dead-zone init guard (VERDICT r4 item 8).

The 0.05 SDF clamp has zero gradient outside its band; a torch-faithful
final-layer bias draw can start ALL predictions clamped, freezing the sdf
loss bit-exactly (hazard analysis in BASELINE.md round 4 — the reference's
torch init has the identical roulette, reference train.py:333-369).
cli/train now re-draws the init until the probe is healthy; these tests pin
the detector and the re-draw loop.
"""

import jax
import jax.numpy as jnp
import pytest

from alignsdf_tpu.config import LearningRateSchedule, NetworkSpecs, Specs
from alignsdf_tpu.models.alignsdf import build_model
from alignsdf_tpu.training.train_state import make_optimizer
from alignsdf_tpu.training.train_step import (
    healthy_init_train_state,
    init_prediction_means,
    init_train_state,
)


def _specs():
    return Specs(
        model_type="1encoder2decoder", encode_style="both",
        point_feat_size=9, latent_size=16, sdf_scale_factor=7.0186,
        samples_per_scene=16, image_size=(64, 64), mano_branch=True,
        object_pose_branch=True, disable_aug=True,
        network_specs=NetworkSpecs(dims=(64,) * 2, latent_in=(1,)),
        lr_schedules=(LearningRateSchedule(initial=1e-3),),
        dataset="obman")


def test_healthy_init_probe_within_band():
    specs = _specs()
    model = build_model(specs)
    opt = make_optimizer(specs)
    state, tries = healthy_init_train_state(
        model, specs, jax.random.PRNGKey(0), opt)
    assert 1 <= tries <= 25
    mh, mo = init_prediction_means(model, specs, state)
    assert abs(mh) < 0.6 * specs.clamping_distance
    assert abs(mo) < 0.6 * specs.clamping_distance


def test_probe_detects_planted_dead_bias():
    specs = _specs()
    model = build_model(specs)
    opt = make_optimizer(specs)
    state = init_train_state(model, specs, jax.random.PRNGKey(0), opt)
    # plant a final-layer bias past the clamp band on the hand trunk
    n_layers = len(specs.network_specs.dims)
    hand = dict(state.params["decoder"]["hand"])
    last = dict(hand[f"linh{n_layers}"])
    last["bias"] = jnp.full_like(last["bias"], 0.2)
    hand[f"linh{n_layers}"] = last
    params = dict(state.params)
    params["decoder"] = dict(params["decoder"]) | {"hand": hand}
    dead = state.replace(params=params)
    mh, _ = init_prediction_means(model, specs, dead)
    # tanh'd? no: raw linear output ~ bias => mean lands near 0.2
    assert abs(mh) > 0.6 * specs.clamping_distance


def test_guard_raises_when_no_healthy_draw(monkeypatch):
    import alignsdf_tpu.training.train_step as ts

    specs = _specs()
    model = build_model(specs)
    opt = make_optimizer(specs)
    monkeypatch.setattr(ts, "init_prediction_means",
                        lambda *a, **k: (0.2, 0.2))
    with pytest.raises(RuntimeError, match="dead zone"):
        ts.healthy_init_train_state(model, specs, jax.random.PRNGKey(0), opt,
                                    max_tries=2)
