"""curvis_tpu.fit — the reusable inverse-problem harness (VERDICT round-3
next-step #7): multi-start vmapped Adam over the differentiable marchers.
The 'Done' criterion: (M, a) AND a tabulated wormhole shape recovered from
the same entry point."""
import jax
import jax.numpy as jnp
import numpy as np

import curvis_tpu as cv
from curvis_tpu.fit import fit
from curvis_tpu.metrics.kerr import KerrMetric
from curvis_tpu.physics import hamiltonian as ham


def _fan(n=48, r0=15.0, phi0=0.0, seed=1):
    rng = np.random.default_rng(seed)
    th0 = np.pi / 2 - 0.3
    pos = jnp.asarray(np.stack([np.zeros(n), np.full(n, r0),
                                np.full(n, th0), np.full(n, phi0)], -1))
    dirs = np.stack([-np.ones(n), 1.2 + 0.4 * rng.standard_normal(n),
                     0.3 * rng.standard_normal(n)], -1)
    dirs = jnp.asarray(dirs / np.linalg.norm(dirs, axis=-1, keepdims=True))
    return pos, dirs


def _escape_obs(m, a, pos, dirs):
    metric = KerrMetric(m=m, a=a)
    p0 = ham.spawn_photon(metric, pos, dirs)
    from curvis_tpu.integrate.kerr_adjoint import march_kerr_adjoint
    x, p, sign, _ = march_kerr_adjoint(
        metric, pos, p0, dt=jnp.asarray(0.15), max_steps=512,
        escape_radius=30.0, backend="xla")
    w = (sign == 1).astype(x.dtype)
    return w, w * jnp.sin(x[:, 3]), w * jnp.cos(x[:, 2]), w * p[:, 1]


def test_fit_recovers_mass_and_spin_multistart():
    """Joint (M, a) from two opposite-side viewpoints (the round-2
    degeneracy-breaking geometry) through the SAME fit() entry point,
    three vmapped starts — the best start lands on the truth."""
    m_t, a_t = jnp.asarray(1.0), jnp.asarray(0.7)
    fans = [_fan(phi0=0.0, seed=1), _fan(phi0=np.pi, seed=2)]
    obs = [_escape_obs(m_t, a_t, *f) for f in fans]

    def loss(prm):
        m, a = prm[0], prm[1]
        tot = 0.0
        for f, o in zip(fans, obs):
            w, s_ph, c_th, pr = _escape_obs(m, a, *f)
            wb = w * o[0]
            tot = tot + jnp.sum(wb * ((s_ph - o[1]) ** 2
                                      + (c_th - o[2]) ** 2
                                      + (pr - o[3]) ** 2)) \
                / jnp.maximum(jnp.sum(wb), 1.0)
        return tot

    def project(p):
        return jnp.stack([jnp.clip(p[0], 0.3, 2.0),
                          jnp.clip(p[1], 0.0, 0.95 * p[0])])

    res = fit(loss, None, iters=150, lr=2e-2, n_starts=3,
              init_sampler=lambda rng, i: jnp.asarray(
                  [0.8 + 0.2 * i, 0.2 + 0.2 * i]),
              project=project)
    m_f, a_f = float(res.params[0]), float(res.params[1])
    assert abs(m_f - 1.0) < 0.02, (m_f, a_f, res.all_finals)
    assert abs(a_f - 0.7) < 0.05, (m_f, a_f, res.all_finals)
    assert res.all_histories.shape == (3, 151)   # iters + final eval
    assert res.loss <= np.nanmin(res.all_finals) + 1e-12


def test_fit_recovers_table_shape_same_entry_point():
    """Wormhole r(l) recovery (the round-3 shape-recovery demo) through
    fit(): a log-rho perturbation fitted to noisy deflection angles via
    the DIFFERENTIABLE tabulation (metrics.table.tabulate_metric_diff —
    the demo's inline operator, now package API)."""
    from curvis_tpu.integrate.adjoint import march_planar_adjoint
    from curvis_tpu.metrics.table import (tabulate_metric,
                                          tabulate_metric_diff)

    def r_true(l):
        rho = 1.0 + 0.25 * jnp.tanh(l / 1.5)
        return jnp.sqrt(rho * rho + l * l)

    K = 5

    def r_of(theta, l):
        # perturbation on log rho around the Ellis baseline rho = 1
        t = jnp.tanh(l / 1.5)
        basis = jnp.stack([t ** k for k in range(K + 1)], -1)
        rho = jnp.exp(basis @ theta)
        return jnp.sqrt(rho * rho + l * l)

    n = 40
    al = jnp.asarray(np.linspace(0.25, 1.3, n // 2))
    alphas = jnp.concatenate([al, al])
    side = jnp.concatenate([jnp.ones(n // 2), -jnp.ones(n // 2)])
    L0, R = 6.0, 12.0

    def deflect(tab):
        l = side * L0
        p_l = -side * jnp.cos(alphas)
        b = tab.r(l) * jnp.sin(alphas)
        lf, psif, plf, sign, _ = march_planar_adjoint(
            tab, (l, jnp.zeros_like(alphas), p_l), b, jnp.asarray(0.05),
            1500, R, backend="xla")
        return psif + jnp.arctan2(b / tab.r(lf), plf), sign

    # observations from the independent numpy tabulation of the truth
    tab_t, _ = tabulate_metric(r_true, degree=12, tol=1e-2,
                               dtype=jnp.float64)
    beta_t, sign_t = deflect(tab_t)
    rng = np.random.default_rng(0)
    beta_obs = beta_t + 1e-3 * jnp.asarray(rng.standard_normal(n))

    def loss(theta):
        tab = tabulate_metric_diff(lambda l: r_of(theta, l), degree=12)
        beta, sign = deflect(tab)
        w = jnp.where(sign == sign_t, 1.0, 0.0)
        return jnp.sum(w * (beta - beta_obs) ** 2) \
            / jnp.maximum(jnp.sum(w), 1.0)

    res = fit(loss, jnp.zeros(K + 1), iters=150, lr=3e-2)
    lg = jnp.linspace(-5.0, 5.0, 101)
    rel = np.abs(np.asarray(r_of(res.params, lg))
                 - np.asarray(r_true(lg))) / np.asarray(r_true(lg))
    assert np.median(rel) < 5e-3, np.median(rel)
    assert res.history[-1] < res.history[0] * 1e-2


def test_fit_schedule_threads_aux():
    """The annealing hook: schedule(i) reaches the loss as data."""
    target = jnp.asarray([2.0, -1.0])

    def loss(p, tau):
        return jnp.sum((p - target) ** 2) + tau * jnp.sum(p ** 2)

    res = fit(loss, jnp.zeros(2), iters=200, lr=5e-2,
              schedule=lambda i: max(0.0, 1.0 - i / 100.0))
    np.testing.assert_allclose(np.asarray(res.params), np.asarray(target),
                               atol=1e-2)
    assert res.converged()


def test_converged_false_on_divergence_and_loss_matches_params():
    """Three regressions: (1) a diverging fit must never report
    converged(); (2) res.loss must be the loss of the RETURNED params
    (history gained a final post-update evaluation); (3) an all-NaN
    multi-start run returns a result instead of crashing nanargmin."""
    from curvis_tpu.fit import FitResult

    # (1) monotonically increasing loss -> not converged
    bad = FitResult(params=None, loss=9.0,
                    history=np.linspace(1.0, 9.0, 100), best_index=0,
                    all_params=None, all_finals=np.array([9.0]),
                    all_histories=None)
    assert not bad.converged()
    # improved early then climbed away from the best point -> not converged
    h = np.concatenate([np.linspace(1.0, 0.1, 50), np.linspace(0.1, 0.9, 50)])
    climb = FitResult(params=None, loss=0.9, history=h, best_index=0,
                      all_params=None, all_finals=np.array([0.9]),
                      all_histories=None)
    assert not climb.converged()

    # (2) quadratic: returned loss corresponds to returned params
    def quad(p):
        return jnp.sum((p - 3.0) ** 2)

    res = fit(quad, jnp.zeros(2), iters=50, lr=2e-1)
    assert len(res.history) == 51
    assert abs(res.loss - float(quad(res.params))) < 1e-6

    # (3) all starts NaN -> graceful result, converged() False
    def nan_loss(p):
        return jnp.sum(p ** 2) * jnp.nan

    res_nan = fit(nan_loss, None, iters=10, lr=1e-2, n_starts=2,
                  init_sampler=lambda rng, i: jnp.asarray(
                      rng.standard_normal(2)))
    assert np.isnan(res_nan.loss)
    assert not res_nan.converged()
