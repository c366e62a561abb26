"""Golden tests: image augmentation pipeline vs reference utils/img_utils.py.

Both implementations consume the global ``random`` / ``np.random`` streams in
the same draw order, so seeding the globals identically must produce
identical aug configs, affine transforms, patches, and occlusions.
"""

import random

import numpy as np
import pytest

from tests import oracle

from alignsdf_tpu.data import img_utils as ours


def _ref():
    oracle.setup_reference()
    import utils.img_utils as ref_img

    return ref_img


@pytest.mark.parametrize("dataset", ["obman", "dexycb"])
def test_get_aug_config_matches_reference(dataset):
    ref_img = _ref()
    for seed in range(8):
        random.seed(seed), np.random.seed(seed)
        ref_cfg = ref_img.get_aug_config(dataset)
        random.seed(seed), np.random.seed(seed)
        our_cfg = ours.get_aug_config(dataset)
        assert np.allclose(our_cfg[0], ref_cfg[0])  # scale
        assert np.allclose(our_cfg[1], ref_cfg[1])  # rot
        assert our_cfg[2] == ref_cfg[2]             # flip
        assert np.allclose(our_cfg[3], ref_cfg[3])  # color
        assert our_cfg[4] == ref_cfg[4]             # occlusion


@pytest.mark.parametrize("rot,scale,inv", [(0.0, 1.0, False), (30.0, 1.2, False),
                                           (-17.5, 0.8, True)])
def test_gen_trans_matches_reference(rot, scale, inv):
    ref_img = _ref()
    ref_t = ref_img.gen_trans_from_patch_cv(
        120.0, 95.0, 180.0, 160.0, 256, 256, scale, rot, inv=inv)
    our_t = ours.gen_trans_from_patch_cv(
        120.0, 95.0, 180.0, 160.0, 256, 256, scale, rot, inv=inv)
    np.testing.assert_allclose(our_t, ref_t, atol=1e-6)


@pytest.mark.parametrize("do_flip,do_occlusion", [(False, False), (True, False),
                                                  (False, True), (True, True)])
def test_generate_patch_image_matches_reference(do_flip, do_occlusion):
    ref_img = _ref()
    rng = np.random.RandomState(3)
    img = (rng.rand(240, 320, 3) * 255).astype(np.uint8)
    bbox = [60.0, 40.0, 170.0, 150.0]

    random.seed(11), np.random.seed(11)
    ref_patch, ref_trans = ref_img.generate_patch_image(
        img, list(bbox), (256, 256), do_flip, 1.1, 25.0, do_occlusion)
    random.seed(11), np.random.seed(11)
    our_patch, our_trans = ours.generate_patch_image(
        img, list(bbox), (256, 256), do_flip, 1.1, 25.0, do_occlusion)
    np.testing.assert_allclose(our_trans, ref_trans, atol=1e-6)
    np.testing.assert_array_equal(our_patch, ref_patch)


def test_decode_seg_maps_matches_reference(tmp_path):
    ref_img = _ref()
    rng = np.random.RandomState(4)
    seg_src = rng.choice([0, 20, 22, 24, 100, 50],
                         size=(64, 64, 3)).astype(np.uint8)
    import cv2

    path = str(tmp_path / "seg.png")
    cv2.imwrite(path, seg_src)
    ref_seg = ref_img.load_seg(path, "obman")
    our_seg = ours.load_seg(path, "obman")
    np.testing.assert_array_equal(our_seg, np.asarray(ref_seg))
