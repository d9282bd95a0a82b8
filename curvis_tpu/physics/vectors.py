"""Covariance-tagged relativistic vectors — the scripting-level API.

Re-design of the reference's vectors.rs: `RelativisticVector` carries a
Covariance tag and its arithmetic refuses mismatched operands
(vectors.rs:63-128 panics); `RelativisticObject` pairs a contravariant
position with a momentum (vectors.rs:134-173).

Inside jit-compiled render paths these tags cannot exist (no runtime checks
under tracing), so the hot paths work on raw arrays with covariance fixed by
convention (physics/geodesic.py).  This module is the *interactive/library*
surface for users exploring trajectories, porting reference scripts, or
asserting covariance discipline in tests.
"""
from __future__ import annotations

import dataclasses
import enum

import jax
import jax.numpy as jnp


class Covariance(enum.Enum):
    """vectors.rs:13-16."""
    CONTRAVARIANT = "contravariant"
    COVARIANT = "covariant"


class CovarianceError(ValueError):
    pass


@dataclasses.dataclass(frozen=True)
class RelativisticVector:
    """A 4-vector with a covariance tag (vectors.rs:39-61)."""

    vector: jax.Array                  # (..., 4)
    covariance: Covariance

    def v(self, i: int):
        return self.vector[..., i]

    def _check_match(self, other, op):
        if not isinstance(other, RelativisticVector):
            raise TypeError(f"cannot {op} RelativisticVector with "
                            f"{type(other).__name__}")
        if other.covariance != self.covariance:
            raise CovarianceError(
                f"cannot {op} vectors with different covariance "
                f"({self.covariance.value} vs {other.covariance.value})")

    def __add__(self, other):
        self._check_match(other, "add")
        return RelativisticVector(self.vector + other.vector, self.covariance)

    def __sub__(self, other):
        self._check_match(other, "subtract")
        return RelativisticVector(self.vector - other.vector, self.covariance)

    def __mul__(self, scalar):
        return RelativisticVector(self.vector * scalar, self.covariance)

    __rmul__ = __mul__

    def __truediv__(self, scalar):
        if jnp.ndim(scalar) == 0 and float(scalar) == 0.0:
            raise ZeroDivisionError("division of RelativisticVector by zero")
        return RelativisticVector(self.vector / scalar, self.covariance)

    def __neg__(self):
        return RelativisticVector(-self.vector, self.covariance)


def contravariant(values) -> RelativisticVector:
    return RelativisticVector(jnp.asarray(values), Covariance.CONTRAVARIANT)


def covariant(values) -> RelativisticVector:
    return RelativisticVector(jnp.asarray(values), Covariance.COVARIANT)


@dataclasses.dataclass(frozen=True)
class RelativisticObject:
    """Position + momentum pair (vectors.rs:134-173); the position must be
    contravariant."""

    position: RelativisticVector
    momentum: RelativisticVector

    def __post_init__(self):
        if self.position.covariance != Covariance.CONTRAVARIANT:
            raise CovarianceError("object position must be contravariant")

    def x(self, i: int):
        return self.position.v(i)

    def p(self, i: int):
        return self.momentum.v(i)


# --- Metric-space geometry on tagged vectors (metrics.rs:355-389) ---------

def _as_contravariant(metric, position: RelativisticVector,
                      v: RelativisticVector):
    from curvis_tpu.physics import geodesic
    if v.covariance is Covariance.CONTRAVARIANT:
        return v.vector
    return geodesic.to_contravariant(metric, position.vector, v.vector)


def dot_product(v1: RelativisticVector, v2: RelativisticVector,
                position: RelativisticVector, metric):
    """g_ij v1^i v2^j, covariance-normalizing internally (metrics.rs:355-371)."""
    from curvis_tpu.physics import geodesic
    a = _as_contravariant(metric, position, v1)
    b = _as_contravariant(metric, position, v2)
    return geodesic.dot_product(metric, position.vector, a, b)


def squared_norm(v, position, metric):
    return dot_product(v, v, position, metric)


def norm(v, position, metric):
    return jnp.sqrt(squared_norm(v, position, metric))


def angle(v1, v2, position, metric):
    """metrics.rs:385-389 (note: like the reference, this returns the
    *cosine-like ratio* dot/(|v1||v2|), not arccos of it — kept for parity)."""
    return dot_product(v1, v2, position, metric) / (
        norm(v1, position, metric) * norm(v2, position, metric))


def new_photon(metric, position: RelativisticVector,
               direction3) -> RelativisticObject:
    """Tagged-API photon constructor (metrics.rs:301-334)."""
    from curvis_tpu.physics import geodesic
    if position.covariance != Covariance.CONTRAVARIANT:
        raise CovarianceError("photon position must be contravariant")
    p = geodesic.new_photon(metric, position.vector, jnp.asarray(direction3))
    return RelativisticObject(position=position,
                              momentum=RelativisticVector(
                                  p, Covariance.COVARIANT))
