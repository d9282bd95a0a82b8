"""Validation against known analytic physics of the Ellis wormhole.

Beyond code-vs-code checks, these tests pin the *physics*:
  - weak-field light deflection: delta ~= (pi/4) (rho/b)^2 for b >> rho,
  - the critical impact parameter is exactly b_c = rho (photons with b < rho
    traverse the throat; b > rho turn back),
  - deflection diverges logarithmically as b -> rho+.
"""
import jax.numpy as jnp
import numpy as np

from curvis_tpu.integrate.rk45 import march_planar_rk45
from curvis_tpu.metrics.base import EllisMetric
from curvis_tpu.physics import planar as pl


def _deflection(metric, b, l0=400.0, R=420.0):
    """Bending angle of a photon with impact parameter b launched inward
    from radius l0 (escaping at R)."""
    r0 = float(metric.r(jnp.asarray(l0)))
    sin_a = b / r0
    # inward: alpha in (pi/2, pi)
    alpha = np.pi - np.arcsin(sin_a)
    rays = pl.PlanarRays(l=jnp.asarray([l0]), psi=jnp.asarray([0.0]),
                         p_l=jnp.asarray([np.cos(alpha)]),
                         b=jnp.asarray([np.sin(alpha) * r0]),
                         r_hat=jnp.zeros((1, 3)), e2=jnp.zeros((1, 3)))
    res = march_planar_rk45(metric, rays, escape_radius=R, rtol=1e-10,
                            atol=1e-12, dt0=0.1, dt_max=50.0,
                            max_steps=200_000)
    sign = int(res.sign[0])
    beta = float(pl.escape_angle_beta(metric, res, rays.b)[0])
    # deflection relative to the undeflected straight line (beta == alpha)
    delta = (beta - alpha + np.pi) % (2 * np.pi) - np.pi
    return delta, sign


def test_weak_field_deflection_coefficient():
    """delta(b) -> (pi/4)(rho/b)^2 as b >> rho — the classical Ellis
    result; catches any sign/normalization error in the RHS."""
    metric = EllisMetric(rho=jnp.asarray(1.0))
    for b, tol in ((8.0, 0.04), (12.0, 0.02), (20.0, 0.01)):
        delta, sign = _deflection(metric, b)
        assert sign == 1                      # turns back, same universe
        expected = (np.pi / 4) / b ** 2
        np.testing.assert_allclose(abs(delta), expected, rtol=0.05 + tol)


def test_critical_impact_parameter_is_rho():
    """b < rho traverses the wormhole; b > rho is reflected."""
    metric = EllisMetric(rho=jnp.asarray(1.0))
    _, sign_in = _deflection(metric, 0.97)
    _, sign_out = _deflection(metric, 1.03)
    assert sign_in == -1
    assert sign_out == 1


def test_deflection_diverges_near_critical():
    """delta grows (logarithmically) as b -> rho+: monotone increase."""
    metric = EllisMetric(rho=jnp.asarray(1.0))
    deltas = []
    for b in (1.5, 1.2, 1.05, 1.01):
        d, s = _deflection(metric, b)
        assert s == 1
        deltas.append(abs(d))
    assert all(d2 > d1 for d1, d2 in zip(deltas, deltas[1:]))
    assert deltas[-1] > 1.5                   # > pi/2 of winding near b_c


def test_dneg_reduces_to_near_flat_for_small_m():
    """DNEG with tiny mass parameter barely deflects (r ~ |l| far out)."""
    metric = EllisMetric(rho=jnp.asarray(1.0))
    from curvis_tpu.metrics.base import InterstellarMetric
    dneg = InterstellarMetric(m=jnp.asarray(1e-3), a=jnp.asarray(1e-4),
                              rho=jnp.asarray(1.0))
    d_ellis, _ = _deflection(metric, 10.0)
    d_dneg, _ = _deflection(dneg, 10.0)
    assert abs(d_dneg) < abs(d_ellis)         # much weaker lens
    assert abs(d_dneg) < 2e-3


def test_euler_first_order_convergence():
    """The parity Euler stepper converges at first order: halving dt halves
    the escape-angle error (against an RK45 truth)."""
    metric = EllisMetric(rho=jnp.asarray(1.0))
    alpha = 2.2
    l0, R = 5.0, 100.0
    r0 = float(metric.r(jnp.asarray(l0)))
    rays = pl.PlanarRays(l=jnp.asarray([l0]), psi=jnp.asarray([0.0]),
                         p_l=jnp.asarray([np.cos(alpha)]),
                         b=jnp.asarray([np.sin(alpha) * r0]),
                         r_hat=jnp.zeros((1, 3)), e2=jnp.zeros((1, 3)))
    truth = march_planar_rk45(metric, rays, escape_radius=R, rtol=1e-12,
                              atol=1e-13, dt0=0.01, max_steps=400_000)
    beta_t = float(pl.escape_angle_beta(metric, truth, rays.b)[0])

    errs = []
    for dt in (0.08, 0.04, 0.02, 0.01):
        res = pl.march_planar_while(metric, rays, dt=dt,
                                    max_steps=2_000_000, escape_radius=R)
        beta = float(pl.escape_angle_beta(metric, res, rays.b)[0])
        errs.append(abs(beta - beta_t))
    orders = [np.log2(e1 / e2) for e1, e2 in zip(errs[:-1], errs[1:])]
    # first-order convergence: each halving of dt halves the error
    assert all(0.7 < o < 1.4 for o in orders), (errs, orders)
