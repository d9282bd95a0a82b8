"""Volumetric starlight scattering (VERDICT round-4 #3a): the lensed-sky
single-scattering source term riding the planar vol kernels' SMEM row.

Closed-form oracle: the source uses the SAME density rho as the absorption
(dtau = kappa rho ds, dI_sc = e^-tau kappa_s albedo_c E_c rho ds), so for
a uniform sky (whose polynomial profile fit is EXACT — a constant) the
scattered channel integrates to

    I_sc_c = (kappa_s albedo_c L / kappa) (1 - e^-tau_final)

a function of the march's own tau output only.
"""
import jax.numpy as jnp
import numpy as np
import pytest

import curvis_tpu as cv
from curvis_tpu.metrics.base import EllisMetric
from curvis_tpu.physics import planar as pl
from curvis_tpu.render.disk import (DiskParams, march_planar_disk_volumetric,
                                    render_blackhole_disk)
from curvis_tpu.render.starlight import (StarlightMap,
                                         starlight_scatter_block)

_DISK = DiskParams(r_inner=3.0, r_outer=9.0, volumetric=True, h_rel=0.12,
                   kappa=2.0, tau_max=30.0, redshift=False, doppler=False,
                   albedo=(0.5, 0.3, 0.2), starlight_scatter=0.7,
                   tint=(1.0, 0.7, 0.4))


def _fan(n=64, seed=4):
    rng = np.random.default_rng(seed)
    met = EllisMetric(rho=jnp.asarray(0.05))       # near-flat
    l0 = jnp.full((n,), 15.0)
    alpha = jnp.asarray(np.pi - (0.15 + 0.45 * rng.random(n)))
    rays = pl.PlanarRays(l0, jnp.zeros((n,)), jnp.cos(alpha),
                         met.r(l0) * jnp.sin(alpha),
                         jnp.zeros((1, 3)), jnp.zeros((1, 3)))
    ang = rng.random(n) * 2 * np.pi
    c1 = jnp.asarray(0.5 * np.cos(ang))
    c2 = jnp.asarray(0.6 * np.sin(ang) + 0.1)
    nz = jnp.asarray(0.4 + 0.4 * rng.random(n))
    return met, rays, c1, c2, nz


def _uniform_block(L):
    """Scatter block for a uniform sky of radiance L (exact constant fit)."""
    n_r = 10
    smap = StarlightMap(jnp.linspace(_DISK.r_inner, _DISK.r_outer, n_r),
                        jnp.full((2, n_r, 8, 3), L))
    return starlight_scatter_block(smap, _DISK, jnp.float64)


_KW = dict(dt=0.03, max_steps=3000, escape_radius=18.0)


def test_uniform_sky_closed_form():
    met, rays, c1, c2, nz = _fan()
    L = 0.6
    blk = _uniform_block(L)
    res_off, tau0, em_off = march_planar_disk_volumetric(
        met, rays, c1, c2, nz, params=_DISK, **_KW)
    res_on, tau1, em_on = march_planar_disk_volumetric(
        met, rays, c1, c2, nz, params=_DISK, scatter_block=blk, **_KW)
    # scattering is a pure source: the march itself is untouched
    np.testing.assert_array_equal(np.asarray(tau0), np.asarray(tau1))
    np.testing.assert_array_equal(np.asarray(res_off.sign),
                                  np.asarray(res_on.sign))
    ks = _DISK.starlight_scatter * _DISK.kappa

    def errs(tau, em_off_, em_on_, c):
        expect_f = (1.0 - np.exp(-np.asarray(tau))) / _DISK.kappa
        sc = np.asarray(em_on_[c]) - _DISK.tint[c] * np.asarray(em_off_[0])
        expect = ks * _DISK.albedo[c] * L * expect_f
        return np.abs(sc - expect) / np.maximum(np.abs(expect), 1e-6)

    # first-order quadrature: a few % at dt = 0.03...
    for c in range(3):
        assert float(errs(tau0, em_off, em_on, c).max()) < 0.05
    # ...and CONVERGES to the continuum closed form as dt shrinks
    kw2 = dict(_KW, dt=_KW["dt"] / 4, max_steps=4 * _KW["max_steps"])
    _, tau0b, em_offb = march_planar_disk_volumetric(
        met, rays, c1, c2, nz, params=_DISK, **kw2)
    _, _, em_onb = march_planar_disk_volumetric(
        met, rays, c1, c2, nz, params=_DISK, scatter_block=blk, **kw2)
    e1 = float(np.median(errs(tau0, em_off, em_on, 1)))
    e2 = float(np.median(errs(tau0b, em_offb, em_onb, 1)))
    assert e2 < 0.5 * e1, (e1, e2)


@pytest.mark.parametrize("stepper", ["euler", "rk45"])
def test_twin_matches_kernel(stepper):
    met, rays, c1, c2, nz = _fan(n=48)
    blk = _uniform_block(0.6)
    if stepper == "euler":
        from curvis_tpu.ops.march_pallas import \
            march_planar_disk_volumetric_pallas
        res_t, tau_t, em_t = march_planar_disk_volumetric(
            met, rays, c1, c2, nz, params=_DISK, scatter_block=blk, **_KW)
        res_k, tau_k, em_k = march_planar_disk_volumetric_pallas(
            met, rays, c1, c2, nz, disk=_DISK, scatter_block=blk,
            interpret=True, **_KW)
    else:
        from curvis_tpu.integrate.rk45 import march_planar_rk45
        from curvis_tpu.ops.march_pallas import march_planar_rk45_pallas
        kw = dict(dt0=0.03, max_steps=1500, escape_radius=18.0, rtol=1e-8,
                  c1=c1, c2=c2, nz=nz, vol_disk=_DISK, scatter_block=blk)
        res_t, tau_t, em_t = march_planar_rk45(met, rays, **kw)
        res_k, tau_k, em_k = march_planar_rk45_pallas(met, rays,
                                                      interpret=True, **kw)
    # euler twins share the exact quadrature; rk45 twins are separately
    # compiled controllers (knife-edge accepts differ at ulps — the
    # established rk45-twin tolerance class)
    tol = dict(rtol=1e-6, atol=1e-9) if stepper == "euler" \
        else dict(rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(tau_t), np.asarray(tau_k), **tol)
    for c in range(3):
        np.testing.assert_allclose(np.asarray(em_t[c]), np.asarray(em_k[c]),
                                   **tol)
    # the scattered term is actually present
    assert float(np.asarray(em_t[2]).max()) > 1e-4


def test_render_vol_starlight_no_longer_raises():
    """The round-4 guard is gone: volumetric + starlight renders, adds
    light vs the emission-only image, and stays finite."""
    yy, xx = np.mgrid[0:16, 0:32]
    sky = np.clip(np.stack([0.4 + 0.3 * np.sin(2 * np.pi * xx / 32),
                            0.3 + 0.3 * (yy / 16),
                            np.full_like(yy, 0.5, dtype=float)], -1), 0, 1)
    bg = cv.make_spherical_image(sky, dtype=jnp.float64)
    met = EllisMetric(rho=jnp.asarray(1.0))
    th = np.pi / 2 - 0.35
    cam = cv.make_camera([0.0, 15.0, th, 0.0],
                         [-np.sin(th), 0.0, -np.cos(th)], [0.0, 0.0, 1.0],
                         30.0, 43.0, 48, 27, dtype=jnp.float64)
    d_on = DiskParams(r_inner=3.0, r_outer=9.0, volumetric=True,
                      h_rel=0.12, kappa=2.0, starlight=True,
                      starlight_grid=(10, 16), starlight_samples=32,
                      brightness=0.2)
    d_off = DiskParams(r_inner=3.0, r_outer=9.0, volumetric=True,
                       h_rel=0.12, kappa=2.0, brightness=0.2)
    kw = dict(dt=0.04, max_steps=2000, escape_radius=18.0, backend="while")
    img_on = np.asarray(render_blackhole_disk(met, cam, bg, disk=d_on, **kw))
    img_off = np.asarray(render_blackhole_disk(met, cam, bg, disk=d_off,
                                               **kw))
    assert np.isfinite(img_on).all()
    d = np.abs(img_on - img_off).sum(-1)
    assert (d > 1e-4).sum() > 50
