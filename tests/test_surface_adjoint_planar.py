"""Differentiable disk & volumetric PLANAR rendering
(integrate/planar_surface_adjoint.py — VERDICT round-4 #1, planar half).

Covers the (stepper x surface) matrix for the reference's own metric
family: forward parity with the production kernels, FD-checked gradients
(incl. disk parameters through the volumetric quadrature and the Chebyshev
table of a user metric), Pallas-pair equality, and the render-level
``render_blackhole_disk(differentiable=...)`` entry.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import curvis_tpu as cv
from curvis_tpu.integrate.planar_surface_adjoint import (
    march_planar_disk_adjoint, march_planar_vol_adjoint)
from curvis_tpu.metrics.base import EllisMetric, SchwarzschildMetric
from curvis_tpu.physics import planar as pl
from curvis_tpu.render.disk import DiskParams, render_blackhole_disk

_VDISK = DiskParams(r_inner=3.0, r_outer=12.0, volumetric=True, h_rel=0.1,
                    kappa=2.0, tau_max=8.0)


def _fan(n=64, seed=2):
    rng = np.random.default_rng(seed)
    l0 = jnp.full((n,), 18.0)
    psi0 = jnp.zeros((n,))
    alpha = jnp.asarray(np.pi - (0.12 + 0.5 * rng.random(n)))
    ang = rng.random(n) * 2 * np.pi
    c1 = jnp.asarray(0.3 * np.cos(ang))
    c2 = jnp.asarray(0.8 * np.sin(ang) + 0.1)
    nz = jnp.asarray(0.5 + 0.4 * rng.random(n))
    return l0, psi0, alpha, c1, c2, nz


def _spawn(met, l0, alpha):
    if pl._unit_lapse(met):
        return jnp.cos(alpha), met.r(l0) * jnp.sin(alpha)
    A0 = met.lapse(l0)
    B0 = met.radial_B(l0)
    return (jnp.cos(alpha) * jnp.sqrt(B0 / A0),
            met.r(l0) * jnp.sin(alpha) / jnp.sqrt(A0))


def _kw(stepper):
    return (dict(dt=0.05, max_steps=4000, escape_radius=25.0)
            if stepper == "euler"
            else dict(dt=0.05, max_steps=800, escape_radius=25.0,
                      rtol=1e-9))


def _fd(f, args, i, eps):
    ap = list(args)
    am = list(args)
    ap[i] = ap[i] + eps
    am[i] = am[i] - eps
    return (float(f(*ap)) - float(f(*am))) / (2 * eps)


def test_euler_disk_forward_matches_kernel():
    """The adjoint's forward must be the Pallas disk kernel's trajectory
    (the kernel tracks zq = c1 u + c2 v; the while-twin's z = r zq
    interpolation differs at O(dt r') — the adjoint mirrors the KERNEL)."""
    from curvis_tpu.ops.march_pallas import march_planar_disk_pallas
    l0, psi0, alpha, c1, c2, _ = _fan()
    met = SchwarzschildMetric(m=jnp.asarray(1.0))
    p_l0, b0 = _spawn(met, l0, alpha)
    kw = _kw("euler")
    rays = pl.PlanarRays(l0, psi0, p_l0, b0, jnp.zeros((1, 3)),
                        jnp.zeros((1, 3)))
    res, h1k, h2k = march_planar_disk_pallas(
        met, rays, c1, c2, r_inner=3.0, r_outer=12.0, interpret=True, **kw)
    l, psi, plo, sign, steps, (h1, h2) = march_planar_disk_adjoint(
        met, (l0, psi0, p_l0), b0, c1, c2, r_inner=3.0, r_outer=12.0,
        backend="xla", **kw)
    np.testing.assert_array_equal(np.asarray(sign), np.asarray(res.sign))
    for c in range(3):
        np.testing.assert_allclose(np.asarray(h1[c]), np.asarray(h1k[c]),
                                   atol=1e-12)
    s = np.asarray(sign)
    assert ((np.asarray(h1[0]) > 0) & (s == 2)).any(), \
        "config must include captured rays with disk hits"


def _disk_loss(m, l0, psi0, alpha, c1, c2, stepper, backend):
    met = SchwarzschildMetric(m=m)
    p_l, b = _spawn(met, l0, alpha)
    out = march_planar_disk_adjoint(
        met, (l0, psi0, p_l), b, c1, c2, r_inner=3.0, r_outer=12.0,
        stepper=stepper, backend=backend, **_kw(stepper))
    H1 = out[5][0]
    w = jnp.where(H1[0] > 0, 1.0, 0.0)      # captured-ray hits included
    return jnp.sum(w * jnp.sin(H1[0]) * H1[1] + w * jnp.cos(H1[2]))


def _vol_loss(m, kappa, l0, psi0, alpha, c1, c2, nz, stepper, backend):
    met = SchwarzschildMetric(m=m)
    p_l, b = _spawn(met, l0, alpha)
    out = march_planar_vol_adjoint(
        met, (l0, psi0, p_l), b, c1, c2, nz, _VDISK,
        disk_theta={"kappa": kappa}, stepper=stepper, backend=backend,
        **_kw(stepper))
    tau, em = out[5]
    return jnp.sum(em[0]) + jnp.sum(jnp.exp(-tau))


@pytest.mark.parametrize("stepper", ["euler", "rk45"])
def test_disk_grad_matches_fd(stepper):
    l0, psi0, alpha, c1, c2, _ = _fan()
    m0 = jnp.asarray(1.0)
    f = jax.jit(partial(_disk_loss, l0=l0, psi0=psi0, alpha=alpha, c1=c1,
                        c2=c2, stepper=stepper, backend="xla"))
    g = float(jax.jit(jax.grad(f))(m0))
    fd = _fd(f, (m0,), 0, 1e-6)
    tol = 5e-4 if stepper == "rk45" else 1e-6
    assert abs(g - fd) / max(abs(fd), 1e-12) < tol, (g, fd)


@pytest.mark.parametrize("stepper", ["euler", "rk45"])
def test_vol_grad_matches_fd(stepper):
    l0, psi0, alpha, c1, c2, nz = _fan()
    m0, k0 = jnp.asarray(1.0), jnp.asarray(2.0)
    f = jax.jit(partial(_vol_loss, l0=l0, psi0=psi0, alpha=alpha, c1=c1,
                        c2=c2, nz=nz, stepper=stepper, backend="xla"))
    g = jax.jit(jax.grad(f, argnums=(0, 1)))(m0, k0)
    tol = 5e-3 if stepper == "rk45" else 1e-6
    fd_m = _fd(f, (m0, k0), 0, 1e-6)
    fd_k = _fd(f, (m0, k0), 1, 1e-6)
    assert abs(float(g[0]) - fd_m) / max(abs(fd_m), 1e-12) < tol
    assert abs(float(g[1]) - fd_k) / max(abs(fd_k), 1e-12) < 1e-6


@pytest.mark.parametrize("stepper,vol", [("euler", False), ("euler", True),
                                         ("rk45", False), ("rk45", True)])
def test_pallas_pair_matches_xla_pair(stepper, vol):
    l0, psi0, alpha, c1, c2, nz = _fan()
    m0 = jnp.asarray(1.0)
    if vol:
        L = partial(_vol_loss, kappa=jnp.asarray(2.0), l0=l0, psi0=psi0,
                    alpha=alpha, c1=c1, c2=c2, nz=nz, stepper=stepper)
    else:
        L = partial(_disk_loss, l0=l0, psi0=psi0, alpha=alpha, c1=c1,
                    c2=c2, stepper=stepper)
    gx = jax.grad(lambda m: L(m, backend="xla"))(m0)
    gp = jax.grad(lambda m: L(m, backend="pallas-interpret"))(m0)
    assert abs(float(gx) - float(gp)) / max(abs(float(gx)), 1e-12) < 1e-6


def test_table_metric_vol_grad():
    """d(volumetric image)/d(shape of r(l)): the Chebyshev table rides the
    emission AND derivative duck rows — the differentiable-tabulation
    capability through a disk image."""
    from curvis_tpu.metrics.table import tabulate_metric_diff
    l0, psi0, alpha, c1, c2, nz = _fan(n=32)

    def loss(rho):
        met = tabulate_metric_diff(
            lambda l: jnp.sqrt(rho * rho + l * l), degree=8, s=1.0)
        p_l, b = _spawn(met, l0, alpha)
        out = march_planar_vol_adjoint(
            met, (l0, psi0, p_l), b, c1, c2, nz, _VDISK, stepper="euler",
            backend="xla", dt=0.05, max_steps=3000, escape_radius=25.0)
        tau, em = out[5]
        return jnp.sum(em[0])

    r0 = jnp.asarray(1.0)
    g = float(jax.jit(jax.grad(loss))(r0))
    f = jax.jit(loss)
    fd = _fd(f, (r0,), 0, 1e-6)
    assert abs(g - fd) / max(abs(fd), 1e-12) < 1e-6, (g, fd)


@pytest.mark.parametrize("stepper,vol", [("euler", False), ("euler", True),
                                         ("rk45", False), ("rk45", True)])
def test_render_disk_differentiable_matches_fd(stepper, vol):
    """render_blackhole_disk(differentiable='scan') image gradients vs FD
    for (M, brightness), thin + volumetric, both steppers."""
    w, h = 48, 27
    yy, xx = np.mgrid[0:h, 0:w]
    smooth = np.stack([np.sin(2 * np.pi * xx / w) * 0.5 + 0.5, yy / h,
                       0.3 + 0.4 * np.cos(2 * np.pi * yy / h)], -1)
    bg = cv.make_spherical_image(smooth, dtype=jnp.float64)
    th = np.pi / 2 - 0.4
    cam = cv.make_camera([0.0, 18.0, th, 0.0],
                         [-np.sin(th), 0.0, -np.cos(th)], [0.0, 0.0, 1.0],
                         30.0, 43.0, w, h, dtype=jnp.float64)
    d = _VDISK if vol else DiskParams(r_inner=3.0, r_outer=12.0)

    def loss(m, br):
        met = SchwarzschildMetric(m=m)
        img = render_blackhole_disk(
            met, cam, bg, dt=0.05,
            max_steps=500 if stepper == "rk45" else 5000,
            escape_radius=25.0, disk=d, stepper=stepper, rtol=1e-6,
            differentiable="scan", disk_theta={"brightness": br})
        return jnp.mean(img)

    m0, b0 = jnp.asarray(1.0), jnp.asarray(1.0)
    f = jax.jit(loss)
    g = jax.jit(jax.grad(loss, argnums=(0, 1)))(m0, b0)
    fd_m = _fd(f, (m0, b0), 0, 1e-7)
    fd_b = _fd(f, (m0, b0), 1, 1e-7)
    tol_m = 5e-4 if stepper == "rk45" else 1e-6
    assert abs(float(g[0]) - fd_m) / max(abs(fd_m), 1e-12) < tol_m
    assert abs(float(g[1]) - fd_b) / max(abs(fd_b), 1e-12) < 1e-6
