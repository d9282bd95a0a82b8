"""Covariance-tagged vector API (ported from vectors.rs:179-238 tests) and
the Orientation wrapper."""
import jax.numpy as jnp
import numpy as np
import pytest

from curvis_tpu.geometry.rotations import Orientation
from curvis_tpu.metrics.base import EllisMetric
from curvis_tpu.physics import vectors as rv


def test_vector_arithmetic():
    a = rv.contravariant([1.0, 2.0, 3.0, 4.0])
    b = rv.contravariant([0.5, 0.5, 0.5, 0.5])
    np.testing.assert_allclose(np.asarray((a + b).vector),
                               [1.5, 2.5, 3.5, 4.5])
    np.testing.assert_allclose(np.asarray((a - b).vector),
                               [0.5, 1.5, 2.5, 3.5])
    np.testing.assert_allclose(np.asarray((2.0 * a).vector), [2, 4, 6, 8])
    np.testing.assert_allclose(np.asarray((a / 2.0).vector),
                               [0.5, 1.0, 1.5, 2.0])


def test_covariance_mismatch_raises():
    # vectors.rs:217-230 #[should_panic] tests
    a = rv.contravariant([1.0, 0.0, 0.0, 0.0])
    b = rv.covariant([1.0, 0.0, 0.0, 0.0])
    with pytest.raises(rv.CovarianceError):
        a + b
    with pytest.raises(rv.CovarianceError):
        a - b
    with pytest.raises(ZeroDivisionError):
        a / 0.0


def test_object_requires_contravariant_position():
    p = rv.covariant([0.0, 5.0, np.pi / 2, 0.0])
    m = rv.covariant([1.0, 0.0, 0.0, 0.0])
    with pytest.raises(rv.CovarianceError):
        rv.RelativisticObject(position=p, momentum=m)


def test_tagged_photon_null_norm():
    metric = EllisMetric(rho=jnp.asarray(1.0))
    pos = rv.contravariant([0.0, 5.0, np.pi / 2, 0.0])
    ph = rv.new_photon(metric, pos, [0.6, 0.0, 0.8])
    n = rv.squared_norm(ph.momentum, pos, metric)
    assert abs(float(n)) < 1e-12
    # accessors
    assert float(ph.x(1)) == 5.0
    assert float(ph.p(0)) == 1.0


def test_orientation_wrapper():
    o = Orientation([1.0, 0.0, 0.0], [1.0, 0.0, 1.0])
    np.testing.assert_allclose(np.asarray(o.up), [0.0, 0.0, 1.0], atol=1e-12)
    R = np.asarray(o.rotation_matrix)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(o.rotation_matrix) @ np.asarray(o.inverse_rotation_matrix),
        np.eye(3), atol=1e-12)
    with pytest.raises(ValueError):
        Orientation([1.0, 0.0, 0.0], [-2.0, 0.0, 0.0])
