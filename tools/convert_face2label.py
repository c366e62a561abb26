"""Extract the MANO hand-part face-label table into an npz/npy asset.

The table (5 fingers x 3 segments, contact regions, sealed-wrist faces over
the 1554-face sealed MANO topology) is static model data defined in the
reference's hand_model_seg/face2label.py:3-64.  This tool parses those data
lists out of the reference file (no code execution of the reference) and
writes ``alignsdf_tpu/assets/face2label_sealed.npy`` in the exact layout the
preprocessing tool consumes (reference src/PreprocessMesh.cpp:776-781).
"""

from __future__ import annotations

import ast
import os
import sys

import numpy as np

N_FACES_SEALED = 1554


def parse_data_lists(path: str) -> dict:
    """Pull the top-level list assignments out of the reference file via AST
    (data only; no execution)."""
    with open(path) as f:
        tree = ast.parse(f.read())
    wanted = {"thumb", "index", "middle", "ring", "little",
              "contact_thumb", "contact_index", "contact_middle",
              "contact_ring", "contact_little", "contact_palm", "seal"}
    out = {}
    for node in tree.body:
        if isinstance(node, ast.Assign) and len(node.targets) == 1:
            target = node.targets[0]
            if isinstance(target, ast.Name) and target.id in wanted:
                out[target.id] = ast.literal_eval(node.value)
    missing = wanted - set(out)
    if missing:
        raise ValueError(f"missing data lists in {path}: {missing}")
    return out


def build_table(data: dict) -> np.ndarray:
    """Table layout per reference face2label.py:40-58: col0 = finger id (1-5),
    col1 = finger*3+segment (1-15), col2 = contact region (1-6),
    col3 = sealed-wrist flag."""
    table = np.zeros((N_FACES_SEALED, 4), np.int8)
    fingers = [data["thumb"], data["index"], data["middle"], data["ring"],
               data["little"]]
    for i, finger in enumerate(fingers):
        for j, segment in enumerate(finger):
            for f in segment:
                table[f, 0] = i + 1
                table[f, 1] = i * 3 + j + 1
    contact = [data["contact_thumb"], data["contact_index"],
               data["contact_middle"], data["contact_ring"],
               data["contact_little"], data["contact_palm"]]
    for i, region in enumerate(contact):
        for f in region:
            table[f, 2] = i + 1
    for f in data["seal"]:
        table[f, 3] = 1
    return table


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else (
        "/root/reference/scripts/sample_points/hand_model_seg/face2label.py")
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "alignsdf_tpu", "assets", "face2label_sealed.npy")
    table = build_table(parse_data_lists(src))
    np.save(out, table)
    print(f"wrote {out}: shape {table.shape}, "
          f"finger faces {np.count_nonzero(table[:, 0])}, "
          f"contact faces {np.count_nonzero(table[:, 2])}, "
          f"seal faces {np.count_nonzero(table[:, 3])}")


if __name__ == "__main__":
    main()
