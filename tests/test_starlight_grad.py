"""Differentiable STARLIT disks (round 5).

The starlight shading tail (albedo * starlight_lookup at the recorded
crossing + the Doppler/beaming chain, render/disk.py) is plain jnp, so
with a precomputed ``starlight_map=`` the disk's smooth shading knobs
(``disk_theta``: albedo, brightness, ...) are exactly differentiable
through starlit renders for both steppers and both march machineries —
the map itself is treated as DATA (camera-independent illumination;
metric gradients through the map's own construction are out of scope and
documented as such in docs/TUTORIAL.md).

These tests anchor the gradients against central finite differences on
the f64 CPU path and pin a tiny albedo recovery, the inverse problem the
capability exists for.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import curvis_tpu as cv
from curvis_tpu.metrics.base import SchwarzschildMetric
from curvis_tpu.render.disk import DiskParams, render_blackhole_disk
from curvis_tpu.render.starlight import compute_disk_starlight_map


@pytest.fixture(scope="module")
def scene():
    yy, xx = np.mgrid[0:64, 0:128]
    tex = np.stack([0.5 + 0.5 * np.sin(2 * np.pi * xx / 128),
                    yy / 64.0, 0.3 + 0.3 * np.cos(2 * np.pi * yy / 64)], -1)
    bg = cv.make_spherical_image(np.clip(tex, 0, 1), dtype=jnp.float64)
    th = np.pi / 2 - 0.35
    f = np.array([-np.sin(th), 0.0, -np.cos(th)])
    f /= np.linalg.norm(f)
    cam = cv.make_camera([0.0, 12.0, th, 0.0], list(f), [0, 0, 1],
                         30.0, 43.0, 48, 27, dtype=jnp.float64)
    met = SchwarzschildMetric(m=jnp.asarray(1.0))
    disk = DiskParams(r_inner=3.0, r_outer=8.0, starlight=True,
                      brightness=0.3)
    smap = compute_disk_starlight_map(met, bg, r_inner=3.0, r_outer=8.0,
                                      escape_radius=40.0, dt=0.1,
                                      max_steps=20000, n_r=16, n_phi=32,
                                      n_samples=32)
    return met, cam, bg, disk, smap


def _loss(scene, stepper, max_steps):
    met, cam, bg, disk, smap = scene

    def loss(alb, br):
        kw = dict(dt=0.1, max_steps=max_steps, escape_radius=40.0,
                  backend="while", starlight_map=smap,
                  differentiable="scan",
                  disk_theta={"albedo": alb, "brightness": br})
        if stepper == "rk45":
            kw.update(stepper="rk45", rtol=1e-6)
        img = render_blackhole_disk(met, cam, bg, disk=disk, **kw)
        return jnp.mean(img)

    return loss


@pytest.mark.parametrize("stepper,max_steps", [("euler", 4000),
                                               ("rk45", 400)])
def test_starlit_disk_shading_grads_match_fd(scene, stepper, max_steps):
    loss = _loss(scene, stepper, max_steps)
    alb = jnp.asarray([0.6, 0.6, 0.6])
    br = jnp.asarray(0.3)
    v, (ga, gb) = jax.value_and_grad(loss, argnums=(0, 1))(alb, br)
    assert np.isfinite(float(v)) and float(v) > 0
    # starlight must contribute: albedo gradient strictly positive
    assert np.all(np.asarray(ga) > 0)
    eps = 1e-5
    fd_b = (float(loss(alb, br + eps)) - float(loss(alb, br - eps))) / (2 * eps)
    np.testing.assert_allclose(float(gb), fd_b, rtol=1e-6)
    e0 = jnp.asarray([eps, 0.0, 0.0])
    fd_a = (float(loss(alb + e0, br)) - float(loss(alb - e0, br))) / (2 * eps)
    np.testing.assert_allclose(float(ga[0]), fd_a, rtol=1e-6)


@pytest.mark.parametrize("stepper,max_steps", [("euler", 4000),
                                               ("rk45", 400)])
def test_volumetric_starlight_scatter_grads(scene, stepper, max_steps):
    # round 5: the in-gas single-scattering source term is differentiable
    # — the traced 27-scalar scatter block rides the surf row through the
    # checkpointed-recompute adjoint (planar_surface_adjoint._common), so
    # gradients reach kappa (absorption AND kappa_s) and albedo
    met, cam, bg, _, smap = scene
    disk = DiskParams(r_inner=3.0, r_outer=8.0, volumetric=True,
                      starlight=True, kappa=0.5)
    kw = dict(dt=0.1, max_steps=max_steps, escape_radius=40.0,
              backend="while", starlight_map=smap)
    if stepper == "rk45":
        kw.update(stepper="rk45", rtol=1e-6)

    # forward parity: the differentiable march IS the production forward
    img_plain = render_blackhole_disk(met, cam, bg, disk=disk, **kw)
    img_diff = render_blackhole_disk(met, cam, bg, disk=disk,
                                     differentiable="scan", **kw)
    np.testing.assert_allclose(np.asarray(img_diff), np.asarray(img_plain),
                               atol=1e-12)

    def loss(kap, alb):
        img = render_blackhole_disk(met, cam, bg, disk=disk,
                                    differentiable="scan",
                                    disk_theta={"kappa": kap,
                                                "albedo": alb}, **kw)
        return jnp.mean(img)

    kap = jnp.asarray(0.5)
    alb = jnp.asarray([0.6, 0.6, 0.6])
    v, (gk, ga) = jax.value_and_grad(loss, argnums=(0, 1))(kap, alb)
    assert np.isfinite(float(v))
    eps = 1e-6
    fdk = (float(loss(kap + eps, alb)) - float(loss(kap - eps, alb))) \
        / (2 * eps)
    np.testing.assert_allclose(float(gk), fdk, rtol=1e-6)
    e0 = jnp.asarray([eps, 0.0, 0.0])
    fda = (float(loss(kap, alb + e0)) - float(loss(kap, alb - e0))) \
        / (2 * eps)
    np.testing.assert_allclose(float(ga[0]), fda, rtol=1e-6)
    # scattering must contribute to the albedo gradient
    assert float(ga[0]) > 0


def test_starlight_scatter_strength_grad(scene):
    # 'starlight_scatter' is itself a DIFF_DISK_KEYS knob (round 5): the
    # scattering strength can be FIT from a gas image
    met, cam, bg, _, smap = scene
    disk = DiskParams(r_inner=3.0, r_outer=8.0, volumetric=True,
                      starlight=True, kappa=0.5)

    def loss(ss):
        img = render_blackhole_disk(met, cam, bg, disk=disk, dt=0.1,
                                    max_steps=1000, escape_radius=40.0,
                                    backend="while", starlight_map=smap,
                                    differentiable="scan",
                                    disk_theta={"starlight_scatter": ss})
        return jnp.mean(img)

    ss = jnp.asarray(1.0)
    v, g = jax.value_and_grad(loss)(ss)
    assert float(g) > 0
    eps = 1e-5
    fd = (float(loss(ss + eps)) - float(loss(ss - eps))) / (2 * eps)
    np.testing.assert_allclose(float(g), fd, rtol=1e-6)


def test_volumetric_starlight_diff_requires_map(scene):
    met, cam, bg, _, _ = scene
    disk = DiskParams(r_inner=3.0, r_outer=8.0, volumetric=True,
                      starlight=True)
    with pytest.raises(ValueError, match="precomputed"):
        render_blackhole_disk(met, cam, bg, disk=disk,
                              differentiable="scan", dt=0.1,
                              max_steps=400, escape_radius=40.0,
                              backend="while")


def test_kerr_starlit_disk_shading_grads_match_fd(scene):
    # the Kerr family composes the same way: the surface adjoint records
    # full (radius, azimuth, side) crossing triples, so the starlight
    # lookup + shading tail differentiates through backend='scan'
    from curvis_tpu.metrics.kerr import KerrMetric
    from curvis_tpu.render.kerr import render_kerr
    from curvis_tpu.render.starlight import compute_kerr_starlight_map
    _, _, bg, _, _ = scene
    kerr = KerrMetric(m=jnp.asarray(1.0), a=jnp.asarray(0.7))
    th = np.pi / 2 - 0.35
    f = np.array([-np.sin(th), 0.0, -np.cos(th)])
    f /= np.linalg.norm(f)
    cam = cv.make_camera([0.0, 15.0, th, 0.0], list(f), [0, 0, 1],
                         30.0, 43.0, 48, 27, dtype=jnp.float64)
    disk = DiskParams(r_inner=3.0, r_outer=9.0, starlight=True,
                      brightness=0.3)
    smap = compute_kerr_starlight_map(kerr, bg, r_inner=3.0, r_outer=9.0,
                                      escape_radius=30.0, dt=0.1,
                                      max_steps=20000, n_r=12, n_phi=24,
                                      n_samples=24, backend="xla")

    def loss(alb):
        img = render_kerr(kerr, cam, bg, dt=0.1, max_steps=600,
                          escape_radius=25.0, disk=disk, backend="scan",
                          starlight_map=smap,
                          disk_theta={"albedo": alb,
                                      "brightness": jnp.asarray(0.3)})
        return jnp.mean(img)

    alb = jnp.asarray([0.6, 0.6, 0.6])
    v, g = jax.value_and_grad(loss)(alb)
    assert np.isfinite(float(v)) and np.all(np.asarray(g) > 0)
    eps = 1e-5
    e0 = jnp.asarray([eps, 0.0, 0.0])
    fd = (float(loss(alb + e0)) - float(loss(alb - e0))) / (2 * eps)
    np.testing.assert_allclose(float(g[0]), fd, rtol=1e-6)


def test_starlit_albedo_recovery(scene):
    # recover a scalar grey albedo from a noisy starlit disk image —
    # the smallest version of "fit the reflectance you see"
    loss = _loss(scene, "euler", 4000)
    met, cam, bg, disk, smap = scene
    true_alb = jnp.asarray([0.55, 0.55, 0.55])
    target = render_blackhole_disk(
        met, cam, bg, disk=disk, dt=0.1, max_steps=4000,
        escape_radius=40.0, backend="while", starlight_map=smap,
        disk_theta={"albedo": true_alb, "brightness": jnp.asarray(0.3)})
    rng = np.random.default_rng(0)
    target = jnp.asarray(np.asarray(target)
                         + rng.normal(0, 1e-3, target.shape))

    def obj(a):
        img = render_blackhole_disk(
            met, cam, bg, disk=disk, dt=0.1, max_steps=4000,
            escape_radius=40.0, backend="while", starlight_map=smap,
            differentiable="scan",
            disk_theta={"albedo": jnp.full((3,), a),
                        "brightness": jnp.asarray(0.3)})
        return jnp.mean((img - target) ** 2)

    g = jax.jit(jax.value_and_grad(obj))
    a = jnp.asarray(0.9)
    lr = 20.0
    for _ in range(40):
        v, da = g(a)
        a = jnp.clip(a - lr * da, 0.05, 1.0)
    assert abs(float(a) - 0.55) < 0.02, float(a)
