"""Golden-value tests: alignsdf_tpu MANO layer vs the PyTorch reference."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from alignsdf_tpu.mano.layer import load_mano_model, mano_forward
from alignsdf_tpu.ops import rotations as R

import oracle

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_layer():
    return oracle.reference_mano_layer(ncomps=15, center_idx=0)


@pytest.fixture(scope="module")
def jax_model():
    return load_mano_model(side="right", ncomps=15, flat_hand_mean=False)


def test_batch_rodrigues_matches_reference():
    oracle.setup_reference()
    from manopth.rodrigues_layer import batch_rodrigues as torch_rodrigues

    rng = np.random.RandomState(0)
    axisang = rng.randn(64, 3).astype(np.float32)
    axisang[0] = 0.0  # exercise the zero-angle regularization
    ref = torch_rodrigues(torch.from_numpy(axisang)).numpy().reshape(-1, 3, 3)
    ours = np.asarray(R.batch_rodrigues(jnp.asarray(axisang)))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_rot6d_matches_reference():
    oracle.setup_reference()
    from manopth import rot6d as torch_rot6d

    rng = np.random.RandomState(1)
    poses = rng.randn(32, 6).astype(np.float32)
    ref = torch_rot6d.compute_rotation_matrix_from_ortho6d(torch.from_numpy(poses)).numpy()
    ours = np.asarray(R.rot6d_to_matrix(jnp.asarray(poses)))
    np.testing.assert_allclose(ours, ref, atol=1e-6)

    ref_r = torch_rot6d.robust_compute_rotation_matrix_from_ortho6d(
        torch.from_numpy(poses)
    ).numpy()
    ours_r = np.asarray(R.robust_rot6d_to_matrix(jnp.asarray(poses)))
    np.testing.assert_allclose(ours_r, ref_r, atol=1e-6)


def test_rigid_inverse_matches_generic_inverse():
    rng = np.random.RandomState(2)
    rots = np.asarray(R.batch_rodrigues(jnp.asarray(rng.randn(16, 3).astype(np.float32))))
    tfs = np.tile(np.eye(4, dtype=np.float32), (16, 1, 1))
    tfs[:, :3, :3] = rots
    tfs[:, :3, 3] = rng.randn(16, 3).astype(np.float32)
    inv = np.asarray(R.rigid_inverse(jnp.asarray(tfs)))
    np.testing.assert_allclose(inv, np.linalg.inv(tfs), atol=1e-5)


def test_mano_forward_matches_reference(ref_layer, jax_model):
    rng = np.random.RandomState(3)
    batch = 4
    pose = (rng.randn(batch, 18) * 0.5).astype(np.float32)
    betas = (rng.randn(batch, 10) * 0.3).astype(np.float32)

    with torch.no_grad():
        t_verts, t_joints, t_pose, t_global, t_center = ref_layer(
            torch.from_numpy(pose), th_betas=torch.from_numpy(betas)
        )

    out = mano_forward(jax_model, jnp.asarray(pose), jnp.asarray(betas), center_idx=0)

    np.testing.assert_allclose(np.asarray(out.full_pose), t_pose.numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out.global_transforms), t_global.numpy(), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(out.joints), t_joints.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.verts), t_verts.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.center), t_center.numpy(), atol=1e-5)


def test_mano_forward_default_betas(ref_layer, jax_model):
    rng = np.random.RandomState(4)
    pose = (rng.randn(2, 18) * 0.5).astype(np.float32)
    with torch.no_grad():
        t_verts, t_joints, *_ = ref_layer(torch.from_numpy(pose))
    out = mano_forward(jax_model, jnp.asarray(pose), None, center_idx=0)
    np.testing.assert_allclose(np.asarray(out.verts), t_verts.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.joints), t_joints.numpy(), atol=1e-5)


def test_mano_forward_no_centering_and_trans(jax_model, ref_layer):
    rng = np.random.RandomState(5)
    pose = (rng.randn(2, 18) * 0.5).astype(np.float32)
    betas = (rng.randn(2, 10) * 0.2).astype(np.float32)
    trans = rng.randn(2, 3).astype(np.float32)
    with torch.no_grad():
        t_verts, t_joints, *_ = ref_layer(
            torch.from_numpy(pose),
            th_betas=torch.from_numpy(betas),
            th_trans=torch.from_numpy(trans),
        )
    out = mano_forward(
        jax_model, jnp.asarray(pose), jnp.asarray(betas), jnp.asarray(trans), center_idx=0
    )
    np.testing.assert_allclose(np.asarray(out.verts), t_verts.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.joints), t_joints.numpy(), atol=1e-5)


def test_mano_forward_grads_finite(jax_model):
    def loss(pose, betas):
        out = mano_forward(jax_model, pose, betas, center_idx=0)
        return jnp.sum(out.verts ** 2) + jnp.sum(out.joints ** 2)

    rng = np.random.RandomState(6)
    pose = jnp.asarray(np.zeros((2, 18), np.float32))  # worst case: zero pose
    betas = jnp.asarray((rng.randn(2, 10) * 0.1).astype(np.float32))
    g_pose, g_betas = jax.grad(loss, argnums=(0, 1))(pose, betas)
    assert np.isfinite(np.asarray(g_pose)).all()
    assert np.isfinite(np.asarray(g_betas)).all()


def test_mano_forward_jits_and_is_stable(jax_model):
    fwd = jax.jit(lambda p, b: mano_forward(jax_model, p, b, center_idx=0).verts)
    rng = np.random.RandomState(7)
    pose = jnp.asarray((rng.randn(8, 18) * 0.5).astype(np.float32))
    betas = jnp.asarray((rng.randn(8, 10) * 0.3).astype(np.float32))
    v1 = fwd(pose, betas)
    v2 = fwd(pose, betas)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
