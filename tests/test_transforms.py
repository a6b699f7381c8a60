import jax.numpy as jnp
import numpy as np

from gsdx.core.transforms import (
    quat_conjugate,
    quat_multiply,
    quat_normalize,
    quat_to_rotmat,
    rotmat_to_quat,
)


def random_quats(rng, n):
    q = rng.normal(size=(n, 4)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_to_rotmat_orthonormal(rng):
    q = random_quats(rng, 64)
    R = np.asarray(quat_to_rotmat(jnp.asarray(q)))
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (64, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_quat_roundtrip(rng):
    q = random_quats(rng, 128)
    R = quat_to_rotmat(jnp.asarray(q))
    q2 = np.asarray(rotmat_to_quat(R))
    # q and -q encode the same rotation
    sign = np.sign(np.sum(q * q2, axis=-1, keepdims=True))
    np.testing.assert_allclose(q2 * sign, q, atol=1e-4)


def test_quat_multiply_matches_matrix_product(rng):
    q1 = random_quats(rng, 32)
    q2 = random_quats(rng, 32)
    q12 = quat_multiply(jnp.asarray(q1), jnp.asarray(q2))
    R12 = np.asarray(quat_to_rotmat(q12))
    R1 = np.asarray(quat_to_rotmat(jnp.asarray(q1)))
    R2 = np.asarray(quat_to_rotmat(jnp.asarray(q2)))
    np.testing.assert_allclose(R12, np.einsum("nij,njk->nik", R1, R2), atol=1e-5)


def test_quat_conjugate_inverts(rng):
    q = random_quats(rng, 16)
    qi = quat_conjugate(jnp.asarray(q))
    ident = np.asarray(quat_multiply(jnp.asarray(q), qi))
    expect = np.tile(np.array([1.0, 0, 0, 0], np.float32), (16, 1))
    np.testing.assert_allclose(ident, expect, atol=1e-5)


def test_quat_normalize_handles_zero():
    q = jnp.zeros((3, 4))
    out = np.asarray(quat_normalize(q))
    assert np.isfinite(out).all()


def test_degenerate_rotmat_branches():
    # 180-degree rotations exercise every Shepperd pivot branch.
    for axis in range(3):
        R = -np.eye(3, dtype=np.float32)
        R[axis, axis] = 1.0
        q = np.asarray(rotmat_to_quat(jnp.asarray(R[None])))
        R2 = np.asarray(quat_to_rotmat(jnp.asarray(q)))[0]
        np.testing.assert_allclose(R2, R, atol=1e-5)
