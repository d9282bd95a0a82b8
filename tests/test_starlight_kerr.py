"""Kerr starlight via axisymmetry (VERDICT round-4 #2).

The (2, n_r, n_phi) illumination map from ONE (n_r x K) bundle of full
Boyer-Lindquist marches: azimuth by rotation, faces by equatorial
reflection, per-sample Liouville boost, horizon shadow and self-shadow.
Oracles: flat-space exactness, the a -> 0 planar-Schwarzschild match (two
fully independent integrations of the same physics), exact axisymmetry,
and the frame-dragged orbit-frame boost.
"""
import jax.numpy as jnp
import numpy as np
import pytest

import curvis_tpu as cv
from curvis_tpu.metrics.base import SchwarzschildMetric
from curvis_tpu.metrics.kerr import KerrMetric
from curvis_tpu.render.disk import DiskParams
from curvis_tpu.render.kerr import render_kerr
from curvis_tpu.render.starlight import (compute_disk_starlight_map,
                                         compute_kerr_starlight_map)

_KW = dict(r_inner=3.0, r_outer=12.0, escape_radius=30.0, n_r=6, n_phi=12,
           n_samples=48, backend="xla")


def _uniform(v=0.6):
    return cv.make_spherical_image(np.full((16, 32, 3), v),
                                   dtype=jnp.float64)


def _smooth_sky():
    yy, xx = np.mgrid[0:32, 0:64]
    sky = np.stack([0.3 + 0.2 * np.sin(2 * np.pi * xx / 64),
                    0.4 + 0.2 * (yy / 32),
                    0.5 - 0.2 * np.cos(2 * np.pi * yy / 32)], -1)
    return cv.make_spherical_image(np.clip(sky, 0, 1), dtype=jnp.float64)


def test_flat_space_uniform_sky_exact():
    """M -> 0: straight rays, E -> 1, no captures — the cosine-weighted
    estimator returns the sky value exactly on both faces."""
    m0 = KerrMetric(m=jnp.asarray(1e-6), a=jnp.asarray(0.0))
    smap = compute_kerr_starlight_map(m0, _uniform(), dt=0.2,
                                      max_steps=2000, **_KW)
    assert float(jnp.abs(smap.values - 0.6).max()) < 1e-4


def test_a_to_zero_matches_planar_schwarzschild():
    """The Kerr map at a ~ 0 must reproduce the planar Schwarzschild map —
    two INDEPENDENT integrations (full BL RK4 vs reduced planar Euler) of
    the same illumination physics, incl. the A^-2 blueshift (the static
    E = sqrt(A) makes boost='static' identical) and the horizon shadow."""
    bg = _smooth_sky()
    pmap = compute_disk_starlight_map(
        SchwarzschildMetric(m=jnp.asarray(1.0)), bg, r_inner=3.0,
        r_outer=12.0, escape_radius=30.0, dt=0.02, max_steps=20_000,
        n_r=6, n_phi=12, n_samples=48, sample_filtering="bilinear",
        backend="while", blueshift=True)
    kmap = compute_kerr_starlight_map(
        KerrMetric(m=jnp.asarray(1.0), a=jnp.asarray(1e-6)), bg, dt=0.05,
        max_steps=40_000, sample_filtering="bilinear", far_accel=False,
        **_KW)
    pv = np.asarray(pmap.values)
    kv = np.asarray(kmap.values)
    rel = np.abs(pv - kv) / np.maximum(np.abs(pv), 1e-3)
    assert float(np.median(rel)) < 5e-3
    assert float(np.percentile(rel, 95)) < 3e-2


def test_axisymmetry_and_face_symmetry_exact():
    m = KerrMetric(m=jnp.asarray(1.0), a=jnp.asarray(0.9))
    smap = compute_kerr_starlight_map(m, _uniform(), dt=0.1,
                                      max_steps=20_000, **_KW)
    v = np.asarray(smap.values)
    # uniform sky: exact azimuth independence; equatorial reflection: faces
    assert float(np.abs(v - v.mean(axis=2, keepdims=True)).max()) < 1e-12
    np.testing.assert_array_equal(v[0], v[1])
    # horizon shadow + blueshift: finite, positive, brightest at the inner
    # edge (A^-2 dominates the capture losses on a uniform sky)
    prof = v[0, :, 0, 0]
    assert np.isfinite(v).all() and (v >= 0).all()
    assert prof[0] > prof[-1]
    # shadow really removes light: below the pure-blueshift bound
    A_in = 1.0 - 2.0 / 3.0
    assert prof[0] < 0.6 / A_in ** 2


def test_orbit_boost_carries_frame_dragging():
    """boost='orbit' receives in the disk material's frame: u^t(E - Omega
    L) per sample — the map must CHANGE with spin (prograde orbits at
    fixed r are less relativistic at high a) and stay finite through the
    photon-orbit clamp."""
    kw = dict(_KW, dt=0.1, max_steps=20_000, boost="orbit")
    v9 = np.asarray(compute_kerr_starlight_map(
        KerrMetric(m=jnp.asarray(1.0), a=jnp.asarray(0.9)), _uniform(),
        **kw).values)
    v0 = np.asarray(compute_kerr_starlight_map(
        KerrMetric(m=jnp.asarray(1.0), a=jnp.asarray(1e-6)), _uniform(),
        **kw).values)
    assert np.isfinite(v9).all() and np.isfinite(v0).all()
    assert float(np.abs(v9 - v0).max()) > 0.5
    # the a~0 inner edge sits at the photon orbit: the clamp caps the
    # bolometric boost at 4^4 of the static value
    assert v0.max() < 0.6 * 4.0 ** 4 / (1.0 - 2.0 / 3.0) ** 2 + 1.0


def test_render_kerr_starlight():
    """render_kerr(disk.starlight=True, starlight_map=...): the reflected
    sky brightens disk pixels, leaves pure-background pixels untouched,
    and a missing map raises with guidance."""
    bg = _smooth_sky()
    met = KerrMetric(m=jnp.asarray(1.0), a=jnp.asarray(0.9))
    disk_on = DiskParams(r_inner=3.0, r_outer=12.0, starlight=True,
                         brightness=0.3, albedo=(0.6, 0.6, 0.6))
    disk_off = DiskParams(r_inner=3.0, r_outer=12.0, brightness=0.3)
    smap = compute_kerr_starlight_map(met, bg, r_inner=3.0, r_outer=12.0,
                                      escape_radius=30.0, dt=0.1,
                                      max_steps=20_000, n_r=12, n_phi=24,
                                      n_samples=48, backend="xla")
    th = np.pi / 2 - 0.3
    cam = cv.make_camera([0.0, 20.0, th, 0.0],
                         [-np.sin(th), 0.0, -np.cos(th)], [0.0, 0.0, 1.0],
                         30.0, 43.0, 64, 36, dtype=jnp.float64)
    kw = dict(dt=0.15, max_steps=3000, escape_radius=30.0, backend="xla")
    img_on = np.asarray(render_kerr(met, cam, bg, disk=disk_on,
                                    starlight_map=smap, **kw))
    img_off = np.asarray(render_kerr(met, cam, bg, disk=disk_off, **kw))
    d = np.abs(img_on - img_off).sum(-1)
    assert np.isfinite(img_on).all()
    assert (d > 1e-3).sum() > 100           # starlight visibly brightens
    # background-only pixels (no disk in either) are bit-identical
    same_bg = d == 0.0
    assert same_bg.sum() > 100
    with pytest.raises(ValueError, match="compute_kerr_starlight_map"):
        render_kerr(met, cam, bg, disk=disk_on, **kw)
