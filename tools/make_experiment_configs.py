"""Generate the canonical experiment configs from Specs defaults.

The three training configurations of AlignSDF (values documented in
SURVEY.md §5/§6 from reference experiments/{obman,dexycb}/*.json) expressed
as programmatic overrides over the framework's defaults.

    python tools/make_experiment_configs.py [outdir=experiments]
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from alignsdf_tpu.config import LearningRateSchedule, Specs, specs_to_dict

OBMAN_SCALE = 7.018621123357809
DEXYCB_SCALE = 6.205380387894951


def configs():
    base = Specs(
        description="3D hand reconstruction (AlignSDF-TPU)",
        hand_sdf_weight=0.5, obj_sdf_weight=0.5, joint_weight=0.5,
        shape_reg_weight=5e-7, pose_reg_weight=5e-5,
    )
    obman = dataclasses.replace(
        base,
        dataset="obman", sdf_scale_factor=OBMAN_SCALE, num_epochs=1600,
        additional_loss_start=1201,
        lr_schedules=(LearningRateSchedule(initial=1e-4, interval=600, factor=0.5),),
    )
    yield "obman_30k.json", dataclasses.replace(
        obman, train_split="experiments/splits/obman_30k.json")
    yield "obman_80k.json", dataclasses.replace(
        obman, train_split="experiments/splits/obman_80k.json")
    yield "dexycb_140k.json", dataclasses.replace(
        base,
        dataset="dexycb", sdf_scale_factor=DEXYCB_SCALE, num_epochs=800,
        additional_loss_start=601, obj_center_weight=0.5,
        train_split="experiments/splits/dexycb_140k.json",
        lr_schedules=(LearningRateSchedule(initial=1e-4, interval=300, factor=0.5),),
    )


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "experiments"
    os.makedirs(outdir, exist_ok=True)
    for name, specs in configs():
        path = os.path.join(outdir, name)
        with open(path, "w") as f:
            json.dump(specs_to_dict(specs), f, indent=2)
        print("wrote", path)


if __name__ == "__main__":
    main()
