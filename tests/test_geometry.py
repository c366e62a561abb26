"""Golden tests: geometry/embedding ops vs the PyTorch reference."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from alignsdf_tpu.ops import geometry as G
from alignsdf_tpu.ops import embeddings as E
from alignsdf_tpu.ops.rotations import batch_rodrigues

import oracle

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_utils():
    oracle.setup_reference()
    import utils.utils as ref

    return ref


def _rand_rigid(batch, rng):
    rots = np.asarray(batch_rodrigues(jnp.asarray(rng.randn(batch, 3).astype(np.float32))))
    tf = np.tile(np.eye(4, dtype=np.float32), (batch, 1, 1))
    tf[:, :3, :3] = rots
    tf[:, :3, 3] = rng.randn(batch, 3).astype(np.float32) * 0.1
    return tf


def test_soft_argmax_matches_reference(ref_utils):
    rng = np.random.RandomState(0)
    heat = rng.randn(2, 64, 64, 64).astype(np.float32)
    ref = ref_utils.soft_argmax(torch.from_numpy(heat.copy())).numpy()
    ours = np.asarray(G.soft_argmax(jnp.asarray(heat)))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_get_obj_trans_matches_reference(ref_utils):
    rng = np.random.RandomState(1)
    batch = 4
    obj_center = (rng.rand(batch, 1, 3) * 64).astype(np.float32)
    center3d = (rng.randn(batch, 1, 3) * 0.1 + np.array([0, 0, 0.6])).astype(np.float32)
    cam = np.tile(np.array([[480.0, 0, 128], [0, 480.0, 128], [0, 0, 1]], np.float32), (batch, 1, 1))
    obj_rot = np.asarray(batch_rodrigues(jnp.asarray(rng.randn(batch, 3).astype(np.float32))))

    for use_rot in (False, True):
        mano_results = {
            "center3d": torch.from_numpy(center3d.copy()),
            "obj_rot": torch.from_numpy(obj_rot.copy()),
        }
        t_trans, t_center = ref_utils.get_obj_trans(
            torch.from_numpy(obj_center.copy()), mano_results,
            torch.from_numpy(cam.copy()), use_rot,
        )
        j_trans, j_center = G.get_obj_trans(
            jnp.asarray(obj_center), jnp.asarray(center3d), jnp.asarray(cam),
            jnp.asarray(obj_rot) if use_rot else None,
        )
        np.testing.assert_allclose(np.asarray(j_trans), t_trans.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(j_center), t_center.numpy(), atol=1e-5)


def test_recover_3d_proj_matches_reference():
    oracle.setup_reference()
    from networks.manobranch import recover_3d_proj

    rng = np.random.RandomState(2)
    batch = 4
    joints = rng.randn(batch, 21, 3).astype(np.float32) * 0.1
    cam = np.tile(np.array([[480.0, 0, 128], [0, 480.0, 128], [0, 0, 1]], np.float32), (batch, 1, 1))
    scale = (rng.randn(batch, 1) * 1e-4).astype(np.float32)
    trans = (rng.randn(batch, 2) * 10).astype(np.float32)

    t_rec, t_c3d = recover_3d_proj(
        torch.from_numpy(joints), torch.from_numpy(cam),
        torch.from_numpy(scale), torch.from_numpy(trans),
    )
    j_rec, j_c3d = G.recover_3d_proj(
        jnp.asarray(joints), jnp.asarray(cam), jnp.asarray(scale), jnp.asarray(trans)
    )
    np.testing.assert_allclose(np.asarray(j_rec), t_rec.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_c3d), t_c3d.numpy(), atol=1e-5)


def test_nerf_embedding_matches_reference(ref_utils):
    rng = np.random.RandomState(3)
    xyz = rng.randn(128, 3).astype(np.float32)
    for pfs in (39, 51):
        multires = (pfs - 3) // 6
        embed, out_dim = ref_utils.get_nerf_embedder(multires)
        ref = embed(torch.from_numpy(xyz)).numpy()
        ours = np.asarray(E.nerf_embed(jnp.asarray(xyz), multires))
        assert ours.shape[-1] == out_dim
        np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.parametrize("encode_style,pfs", [
    ("hand", 6), ("hand", 51), ("obj", 6), ("both", 9), ("both", 51 + 3),
])
def test_kinematic_embedding_matches_reference(ref_utils, encode_style, pfs):
    rng = np.random.RandomState(4)
    batch, n = 2, 32
    scale_factor = 7.018621123357809
    xyz = (rng.randn(batch * n, 3).astype(np.float32)) * 0.5
    global_trans = _rand_rigid(batch * 16, rng).reshape(batch, 16, 4, 4)
    rot_center = rng.randn(batch, 1, 3).astype(np.float32) * 0.1
    obj_trans = _rand_rigid(batch, rng)

    if encode_style == "both" and pfs == 54:
        pfs = 54  # 48 hand dims (16 joints) + 3 mano + 3 obj... not a reference config
        pytest.skip("not a reference configuration")

    mano_results = {
        "global_trans": torch.from_numpy(global_trans.copy()),
        "rot_center": torch.from_numpy(rot_center.copy()),
    }
    obj_results = {"obj_trans": torch.from_numpy(obj_trans.copy())}
    ref = ref_utils.kinematic_embedding(
        torch.from_numpy(xyz.copy()), mano_results, n, pfs, scale_factor,
        obj_results, encode_style,
    ).numpy()

    ours = np.asarray(
        E.kinematic_embedding(
            jnp.asarray(xyz), n, pfs, scale_factor, encode_style,
            rot_center=jnp.asarray(rot_center),
            global_trans=jnp.asarray(global_trans),
            obj_trans=jnp.asarray(obj_trans),
        )
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_pixel_alignment_matches_reference(ref_utils):
    rng = np.random.RandomState(5)
    batch, n, c, hf = 2, 64, 8, 64
    feat = rng.randn(batch, c, hf, hf).astype(np.float32)
    xyz = (rng.randn(batch * n, 3) * 0.8).astype(np.float32)
    root = (rng.randn(batch, 1, 3) * 0.05 + np.array([0, 0, 0.6])).astype(np.float32)
    cam = np.tile(np.array([[480.0, 0, 128], [0, 480.0, 128], [0, 0, 1]], np.float32), (batch, 1, 1))
    scale_factor = 7.018621123357809

    mano_results = {"joints": torch.from_numpy(np.concatenate(
        [root, np.zeros((batch, 20, 3), np.float32)], axis=1))}
    ref = ref_utils.pixel_alignment(
        torch.from_numpy(feat.copy()), torch.from_numpy(xyz.copy()),
        torch.from_numpy(np.concatenate([cam, np.zeros((batch,3,1),np.float32)],axis=2)), mano_results, 256, scale_factor,
    ).numpy()

    ours = np.asarray(
        G.pixel_alignment(
            jnp.asarray(feat), jnp.asarray(xyz), jnp.asarray(cam),
            jnp.asarray(root), 256, scale_factor,
        )
    )
    np.testing.assert_allclose(ours, ref, atol=2e-4)
