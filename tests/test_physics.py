"""Physics invariants (ported from metrics.rs:509-573) + f64 RK45 oracle."""
import jax
import jax.numpy as jnp
import numpy as np

from curvis_tpu.integrate.march import compute_trajectory, march
from curvis_tpu.metrics.base import EllisMetric, InterstellarMetric, make_metric
from curvis_tpu.physics import geodesic


def _equatorial_photon(metric, l=5.0, angle=np.pi / 4):
    x = jnp.array([0.0, l, np.pi / 2, 0.0])
    d = jnp.array([np.cos(angle), 0.0, np.sin(angle)])
    p = geodesic.new_photon(metric, x, d)
    return x, p, d


def test_photon_null_norm_and_direction_roundtrip():
    # metrics.rs:516-541
    metric = EllisMetric(rho=jnp.asarray(1.0))
    x, p, d = _equatorial_photon(metric)
    assert abs(float(geodesic.squared_norm_cov(metric, x, p))) < 1e-12
    d2 = geodesic.momentum_to_direction(metric, x, p)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d), atol=1e-12)


def test_null_norm_preserved_under_propagation():
    # The physical invariant behind metrics.rs:544-570: ||p||^2 = 0 is
    # conserved by the geodesic flow.  (The reference test evaluates the norm
    # at the *initial* position, where it is NOT conserved — that assertion
    # only holds at the photon's current position, which is what we check.)
    metric = EllisMetric(rho=jnp.asarray(1.0))
    x0, p0, _ = _equatorial_photon(metric)
    xs, ps = compute_trajectory(metric, x0, p0, dt=0.01, n_steps=101)
    norms = jax.vmap(lambda x, p: geodesic.squared_norm_cov(metric, x, p))(xs, ps)
    assert float(jnp.max(jnp.abs(norms))) < 5e-3      # Euler drift O(dt)
    # RK4 conserves it far more tightly.
    xs, ps = compute_trajectory(metric, x0, p0, dt=0.01, n_steps=101,
                                stepper="rk4")
    norms = jax.vmap(lambda x, p: geodesic.squared_norm_cov(metric, x, p))(xs, ps)
    assert float(jnp.max(jnp.abs(norms))) < 1e-9


def test_conserved_momenta_exact():
    # p_t and p_phi have zero derivative (metrics.rs:259-264) -> bit-exact.
    metric = make_metric("interstellar", m=0.1, a=1e-4, rho=1.0)
    x0, p0, _ = _equatorial_photon(metric, angle=1.2)
    xs, ps = compute_trajectory(metric, x0, p0, dt=0.05, n_steps=500)
    assert np.all(np.asarray(ps[:, 0]) == float(p0[0]))
    assert np.all(np.asarray(ps[:, 3]) == float(p0[3]))


def test_flat_metric_straight_line():
    # In flat space (r=l) a radial photon moves at dl/dlambda = p_l = const.
    metric = make_metric("flat")
    x = jnp.array([0.0, 5.0, np.pi / 2, 0.0])
    p = geodesic.new_photon(metric, x, jnp.array([1.0, 0.0, 0.0]))
    xs, ps = compute_trajectory(metric, x, p, dt=0.1, n_steps=50)
    np.testing.assert_allclose(np.asarray(xs[:, 1]),
                               5.0 + 0.1 * np.arange(50), atol=1e-12)


def test_flat_metric_offcenter_straight_line():
    """End-to-end flat-space oracle for the march: a photon launched in any
    direction from any point travels in a world-space straight line."""
    metric = make_metric("flat")
    x0 = jnp.array([0.0, 5.0, 1.1, 0.7])
    # direction in the local frame
    d = jnp.array([0.4, -0.5, 0.77])
    d = d / jnp.linalg.norm(d)
    p0 = geodesic.new_photon(metric, x0, d)
    xs, ps = compute_trajectory(metric, x0, p0, dt=0.001, n_steps=4000,
                                stepper="rk4")
    # Convert trajectory to world cartesian and check collinearity.
    from curvis_tpu.geometry.rotations import frame_matrix, vector3_from_theta_phi
    l, th, ph = np.asarray(xs[:, 1]), np.asarray(xs[:, 2]), np.asarray(xs[:, 3])
    pts = l[:, None] * np.asarray(
        vector3_from_theta_phi(jnp.asarray(th), jnp.asarray(ph)))
    start = pts[0]
    w0 = np.asarray(frame_matrix(x0[2], x0[3])) @ np.asarray(d)
    tvals = (pts - start) @ w0
    residual = pts - start - tvals[:, None] * w0
    assert np.abs(residual).max() < 1e-6


def _escape_angle_oracle_scipy(rho, l0, alpha, escape_radius):
    """High-accuracy escape angle for the Ellis metric via scipy RK45 in f64.

    Integrates the reduced planar system (l, phi, p_l), p_phi = const, and
    returns the asymptotic in-plane direction angle of the photon.
    """
    from scipy.integrate import solve_ivp

    r = np.sqrt(rho * rho + l0 * l0)
    p_l = np.cos(alpha)
    p_phi = np.sin(alpha) * r       # covariant p_phi = d_z * r (theta = pi/2)

    def rhs(t, y):
        l, phi, pl = y
        r2 = rho * rho + l * l
        rr = np.sqrt(r2)
        dl = pl
        dphi = p_phi / r2
        dpl = (p_phi ** 2) * (l / rr) / rr ** 3
        return [dl, dphi, dpl]

    def escaped(t, y):
        return abs(y[0]) - escape_radius
    escaped.terminal = True
    escaped.direction = 1.0

    sol = solve_ivp(rhs, [0, 1e4], [l0, 0.0, p_l], events=escaped,
                    rtol=1e-11, atol=1e-12, dense_output=True)
    assert sol.status == 1, "photon did not escape in oracle"
    l, phi, pl = sol.y[:, -1]
    # in-plane direction angle = phi + atan2(v_phihat, v_lhat)
    r2 = rho * rho + l * l
    v_l = pl
    v_ph = p_phi / np.sqrt(r2)
    beta = phi + np.arctan2(v_ph, v_l)
    sign = 1.0 if l > 0 else -1.0
    return np.mod(beta, 2 * np.pi), sign


def test_escape_angle_matches_scipy_oracle():
    """Our Euler march at small dt converges to the scipy RK45 oracle."""
    rho, l0, R = 1.0, 5.0, 100.0
    metric = EllisMetric(rho=jnp.asarray(rho))
    for alpha in [0.3, 0.9, 1.6, 2.5]:
        x0 = jnp.array([0.0, l0, np.pi / 2, 0.0])
        d = jnp.array([np.cos(alpha), 0.0, np.sin(alpha)])
        p0 = geodesic.new_photon(metric, x0, d)
        res = march(metric, x0[None], p0[None], dt=0.002, max_steps=400_000,
                    escape_radius=R, backend="while", stepper="rk4")
        assert int(res.sign[0]) != 0
        l, th, ph = [float(v) for v in res.x[0, 1:]]
        u = np.asarray(geodesic.momentum_to_direction(metric, res.x[0], res.p[0]))
        beta_ours = np.mod(ph + np.arctan2(u[2], u[0]), 2 * np.pi)
        beta_oracle, sign_oracle = _escape_angle_oracle_scipy(rho, l0, alpha, R)
        assert float(res.sign[0]) == sign_oracle
        assert abs(beta_ours - beta_oracle) < 2e-3, (alpha, beta_ours, beta_oracle)


def test_dneg_metric_shape_functions():
    m, a, rho = 0.1, 1e-4, 1.0
    metric = InterstellarMetric(m=jnp.asarray(m), a=jnp.asarray(a),
                                rho=jnp.asarray(rho))
    # inside the throat
    assert float(metric.r(jnp.asarray(0.0))) == rho
    assert float(metric.r_derivative(jnp.asarray(0.0))) == 0.0
    # far away r ~ |l| + const, r' -> sign(l)
    l = jnp.asarray(50.0)
    assert abs(float(metric.r_derivative(l)) - 1.0) < 2e-3
    assert abs(float(metric.r_derivative(-l)) + 1.0) < 2e-3
    # continuity at the throat edge
    eps = 1e-9
    assert abs(float(metric.r(jnp.asarray(a + eps))) - rho) < 1e-6
    # grads w.r.t. params exist and are finite
    g = jax.grad(lambda mm: mm.r(jnp.asarray(3.0)))(metric)
    assert np.isfinite(float(g.m)) and np.isfinite(float(g.rho))


def test_euler_step_parity_formulas():
    """One Euler step equals the hand-computed reference update
    (metrics.rs:283-297 with RHS 223-270)."""
    metric = EllisMetric(rho=jnp.asarray(1.3))
    x = jnp.array([0.1, 2.0, 1.0, 0.5])
    p = jnp.array([1.0, -0.3, 0.7, 1.1])
    dt = 0.05
    x1, p1 = geodesic.euler_step(metric, x, p, dt)

    rho, (t, l, th, ph), (pt, pl, pth, pph) = 1.3, map(float, x), map(float, p)
    r2 = rho * rho + l * l
    r = np.sqrt(r2)
    s = np.sin(th)
    dx = np.array([-pt, pl, pth / r2, pph / (r2 * s * s)])
    b2 = pth ** 2 + pph ** 2 / s ** 2
    dp = np.array([0.0, b2 * (l / r) / r ** 3,
                   pph ** 2 * np.cos(th) / (r2 * s ** 3), 0.0])
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x) + dt * dx, rtol=1e-14)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p) + dt * dp, rtol=1e-14)
