"""Pack a reference-format dataset tree into the reference's five-LMDB layout.

Schema parity with the reference packer (reference tools/create_lmdb.py:21-310):
  rgb.lmdb      raw uint8 HWC BGR image bytes per key
  segm.lmdb     raw segmentation images (when a segm/ dir exists)
  norm.lmdb     f32[4] = [offset(3), scale]
  meta.lmdb     f32 (61,3) block: joints(21) | corners(9) | rest corners(9) |
                pose(15x3) | affine(4x3) | intrinsics(3x3)
  sdf_hand.lmdb f32 (20000,6) rows [xyz, sdf_hand, sdf_obj, label], zero-padded
  sdf_obj.lmdb  same with the object's own sdf in column 4
plus each LMDB's side-car meta_info.json ({name, keys} and, for sdf,
{pos_num, neg_num, dim}).

The databases are written with the bundled pure-python LMDB engine
(alignsdf_tpu.data.lmdb_format) — real LMDB file format, readable by liblmdb
and by the reference's readers (reference utils/sdf_utils.py:119-163).

Usage:
    python tools/create_lmdb.py <data_source> [--dataset obman] [--keys k ...]
    # data_source = .../<dataset>/<mode> with rgb/ norm/ meta/ sdf_hand/ sdf_obj/
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from alignsdf_tpu.data.lmdb_format import LmdbWriter  # noqa: E402

SDF_ROWS = 20000  # fixed block height (reference tools/create_lmdb.py:205)


def _keys_from(folder: str) -> list:
    return sorted(os.path.splitext(f)[0] for f in os.listdir(folder))


def _finish(writer: LmdbWriter, lmdb_path: str, meta_info: dict) -> None:
    writer.close()
    with open(os.path.join(lmdb_path, "meta_info.json"), "w") as f:
        json.dump(meta_info, f, indent=2)


def pack_images(folder: str, lmdb_path: str, name: str, keys: list) -> None:
    """Raw decoded image bytes, BGR HWC like cv2.imread
    (reference tools/create_lmdb.py:267-310)."""
    with LmdbWriter(lmdb_path) as w:
        for key in keys:
            for ext in (".jpg", ".png"):
                path = os.path.join(folder, key + ext)
                if os.path.isfile(path):
                    break
            img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
            w.put(key, np.ascontiguousarray(img))
    _finish(w, lmdb_path, {"name": name})


def pack_norm(folder: str, lmdb_path: str, name: str, keys: list) -> None:
    """f32[4] = offset(3) + scale (reference tools/create_lmdb.py:131-180)."""
    with LmdbWriter(lmdb_path) as w:
        for key in keys:
            data = np.load(os.path.join(folder, key + ".npz"))
            sample = np.zeros(4, np.float32)
            sample[0:3] = data["offset"]
            sample[3] = np.asarray(data["scale"]).reshape(-1)[0]
            w.put(key, sample)
    _finish(w, lmdb_path, {"name": name, "keys": keys})


def pack_meta(folder: str, lmdb_path: str, name: str, keys: list,
              dataset: str) -> None:
    """(61,3) f32 block (reference tools/create_lmdb.py:72-128)."""
    with LmdbWriter(lmdb_path) as w:
        for key in keys:
            with open(os.path.join(folder, key + ".pkl"), "rb") as f:
                data = pickle.load(f)
            block = np.zeros((61, 3), np.float32)
            block[:21] = np.asarray(data["coords_3d"], np.float32)
            block[21:30] = np.asarray(data["obj_corners_3d"], np.float32)
            block[30:39] = np.asarray(data["obj_rest_corners_3d"], np.float32)
            block[39:54] = np.asarray(data["hand_pose"], np.float32).reshape(-1, 3)
            block[54:58] = np.asarray(
                data["affine_transform"], np.float32)[:3, :].reshape(-1, 3)
            if dataset == "obman":
                block[58:61] = np.array(
                    [[480.0, 0, 128], [0, 480.0, 128], [0, 0, 1]], np.float32)
            else:
                block[58:61] = np.asarray(
                    data["cam_intr"], np.float32)[:3, :3].reshape(-1, 3)
            w.put(key, block)
    _finish(w, lmdb_path, {"name": name, "keys": keys})


def pack_sdf(folder: str, lmdb_path: str, name: str, keys: list,
             is_hand: bool) -> None:
    """(20000,6) f32 blocks + pos/neg counts; obj rows swap the sdf columns so
    column 3 is always the hand field (reference tools/create_lmdb.py:183-260)."""
    pos_num, neg_num = [], []
    with LmdbWriter(lmdb_path) as w:
        for key in keys:
            data = np.load(os.path.join(folder, key + ".npz"))
            pos = np.asarray(data["pos"], np.float32)
            neg = np.asarray(data["neg"], np.float32)
            pos_other = np.asarray(data["pos_other"], np.float32).reshape(-1, 1)
            neg_other = np.asarray(data["neg_other"], np.float32).reshape(-1, 1)
            if is_hand:
                lab_pos = np.asarray(data["lab_pos"], np.float32).reshape(len(pos), -1)[:, [0]]
                lab_neg = np.asarray(data["lab_neg"], np.float32).reshape(len(neg), -1)[:, [0]]
                pos_rows = np.concatenate([pos, pos_other, lab_pos], axis=1)
                neg_rows = np.concatenate([neg, neg_other, lab_neg], axis=1)
            else:
                lab_pos = np.asarray(data["lab_pos_other"], np.float32).reshape(len(pos), -1)[:, [0]]
                lab_neg = np.asarray(data["lab_neg_other"], np.float32).reshape(len(neg), -1)[:, [0]]
                pos_rows = np.concatenate([pos[:, :3], pos_other, pos[:, [3]], lab_pos], axis=1)
                neg_rows = np.concatenate([neg[:, :3], neg_other, neg[:, [3]], lab_neg], axis=1)
            pos_num.append(int(len(pos)))
            neg_num.append(int(len(neg)))
            block = np.zeros((SDF_ROWS, 6), np.float32)
            rows = np.concatenate([pos_rows, neg_rows], axis=0)
            block[: len(rows)] = rows
            w.put(key, block)
    _finish(w, lmdb_path, {
        "name": name, "pos_num": pos_num, "neg_num": neg_num, "dim": 6,
        "keys": keys,
    })


def create_lmdbs(data_source: str, dataset: str = "obman",
                 mode: str = "train", keys: list = None) -> None:
    if keys is None:
        keys = _keys_from(os.path.join(data_source, "sdf_hand"))

    pack_images(os.path.join(data_source, "rgb"),
                os.path.join(data_source, "rgb.lmdb"),
                f"{dataset}_rgb_{mode}", keys)
    if os.path.isdir(os.path.join(data_source, "segm")):
        pack_images(os.path.join(data_source, "segm"),
                    os.path.join(data_source, "segm.lmdb"),
                    f"{dataset}_segm_{mode}", keys)
    pack_norm(os.path.join(data_source, "norm"),
              os.path.join(data_source, "norm.lmdb"),
              f"{dataset}_norm_{mode}", keys)
    pack_meta(os.path.join(data_source, "meta"),
              os.path.join(data_source, "meta.lmdb"),
              f"{dataset}_meta_{mode}", keys, dataset)
    pack_sdf(os.path.join(data_source, "sdf_hand"),
             os.path.join(data_source, "sdf_hand.lmdb"),
             f"{dataset}_sdf_hand_{mode}", keys, is_hand=True)
    pack_sdf(os.path.join(data_source, "sdf_obj"),
             os.path.join(data_source, "sdf_obj.lmdb"),
             f"{dataset}_sdf_obj_{mode}", keys, is_hand=False)
    print(f"wrote 5 LMDBs for {len(keys)} keys under {data_source}")


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("data_source")
    parser.add_argument("--dataset", default="obman")
    parser.add_argument("--mode", default="train")
    parser.add_argument("--keys", nargs="*", default=None)
    args = parser.parse_args()
    create_lmdbs(args.data_source, args.dataset, args.mode, args.keys)


if __name__ == "__main__":
    main()
