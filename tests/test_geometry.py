"""Rotation-algebra properties, ported from the reference's randomized tests
(/root/reference/src/algebra.rs:136-312)."""
import jax.numpy as jnp
import numpy as np

from curvis_tpu.geometry import rotations as rot


def test_orientation_canonical_identity():
    R = rot.rotation_from_forward_up(jnp.array([1.0, 0.0, 0.0]),
                                     jnp.array([0.0, 0.0, 1.0]))
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-15)


def test_orientation_non_orthogonal_up_repair():
    # algebra.rs:154-176 — up is made orthogonal to forward.
    cases = [
        ([1.0, 0.0, 0.0], [1.0, 0.0, 1.0], [0.0, 0.0, 1.0]),
        ([1.0, 1.0, 0.0], [-1.0, -1.0, 1.0], [0.0, 0.0, 1.0]),
        ([1.0, 0.0, 1.0], [1.0, 1.0, 1.0], [0.0, 1.0, 0.0]),
    ]
    for fwd, up, expected_up in cases:
        got = rot.orthogonal_up(jnp.array(fwd), jnp.array(up))
        np.testing.assert_allclose(np.asarray(got), expected_up, atol=1e-12)


def test_rotation_inverse_identity(rng):
    # algebra.rs:212-235 — R @ R^T = I for random forward/up pairs (batched).
    f = rng.uniform(-1, 1, size=(256, 3))
    u = rng.uniform(-1, 1, size=(256, 3))
    R = np.asarray(rot.rotation_from_forward_up(jnp.asarray(f), jnp.asarray(u)))
    prod = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(3), prod.shape),
                               atol=1e-12)
    # forward maps to normalized forward
    fw = np.einsum("nij,j->ni", R, np.array([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(fw, f / np.linalg.norm(f, axis=-1, keepdims=True),
                               atol=1e-12)


def test_rotation_from_theta_phi(rng):
    # algebra.rs:238-257 — rotation maps +x to the (theta, phi) direction.
    theta = rng.uniform(0, np.pi, size=1000)
    phi = rng.uniform(0, 2 * np.pi, size=1000)
    R = np.asarray(rot.rotation_from_theta_phi(jnp.asarray(theta), jnp.asarray(phi)))
    got = np.einsum("nij,j->ni", R, np.array([1.0, 0.0, 0.0]))
    want = np.stack([np.sin(theta) * np.cos(phi),
                     np.sin(theta) * np.sin(phi),
                     np.cos(theta)], axis=-1)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_vector3_from_theta_phi_special_cases():
    # algebra.rs:260-282 — exhaustive special-case table.
    s = 1.0 / np.sqrt(2.0)
    cases = [
        ((0.0, 0.0), (0.0, 0.0, 1.0)),
        ((np.pi / 2, 0.0), (1.0, 0.0, 0.0)),
        ((np.pi, 0.0), (0.0, 0.0, -1.0)),
        ((np.pi / 2, np.pi / 4), (s, s, 0.0)),
        ((-np.pi / 2, np.pi / 4), (-s, -s, 0.0)),
        ((np.pi / 2, -np.pi / 4), (s, -s, 0.0)),
        ((-np.pi / 2, -np.pi / 4), (-s, s, 0.0)),
        ((np.pi / 2, np.pi / 2), (0.0, 1.0, 0.0)),
        ((np.pi / 2, np.pi), (-1.0, 0.0, 0.0)),
        ((np.pi / 2, 3 * np.pi / 2), (0.0, -1.0, 0.0)),
    ]
    for (theta, phi), want in cases:
        got = rot.vector3_from_theta_phi(jnp.asarray(theta), jnp.asarray(phi))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-12)


def test_theta_phi_roundtrip(rng):
    # algebra.rs:284-309 — vector -> angles -> vector round-trip at random radii.
    theta = rng.uniform(1e-3, np.pi - 1e-3, size=1000)
    phi = rng.uniform(0, 2 * np.pi, size=1000)
    r = rng.uniform(0.1, 5.0, size=1000)
    v = r[:, None] * np.asarray(
        rot.vector3_from_theta_phi(jnp.asarray(theta), jnp.asarray(phi)))
    t2, p2 = rot.theta_phi_from_vector3(jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(t2), theta, atol=1e-9)
    np.testing.assert_allclose(np.asarray(p2), phi, atol=1e-9)


def test_rotation_between(rng):
    v1 = rng.uniform(-1, 1, size=(200, 3))
    v2 = rng.uniform(-1, 1, size=(200, 3))
    R = np.asarray(rot.rotation_between(jnp.asarray(v1), jnp.asarray(v2)))
    got = np.einsum("nij,nj->ni", R, v1 / np.linalg.norm(v1, axis=-1, keepdims=True))
    np.testing.assert_allclose(
        got, v2 / np.linalg.norm(v2, axis=-1, keepdims=True), atol=1e-10)
    # orthonormality
    prod = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(3), prod.shape),
                               atol=1e-10)


def test_rotation_between_degenerate():
    a = jnp.array([0.3, -0.2, 0.9])
    # parallel -> identity
    R = np.asarray(rot.rotation_between(a, 2.5 * a))
    np.testing.assert_allclose(R, np.eye(3), atol=1e-8)
    # antiparallel -> a proper pi-rotation taking a to -a
    R = np.asarray(rot.rotation_between(a, -a))
    an = np.asarray(a) / np.linalg.norm(a)
    np.testing.assert_allclose(R @ an, -an, atol=1e-8)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-8)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-8)


def test_frame_matrix_orthonormal(rng):
    theta = rng.uniform(1e-3, np.pi - 1e-3, size=500)
    phi = rng.uniform(0, 2 * np.pi, size=500)
    F = np.asarray(rot.frame_matrix(jnp.asarray(theta), jnp.asarray(phi)))
    prod = np.einsum("nij,nkj->nik", F, F)
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(3), prod.shape),
                               atol=1e-12)
    # first column is r_hat
    r_hat = np.asarray(rot.vector3_from_theta_phi(jnp.asarray(theta), jnp.asarray(phi)))
    np.testing.assert_allclose(F[..., 0], r_hat, atol=1e-12)
