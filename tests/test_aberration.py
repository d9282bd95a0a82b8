"""Relativistic camera-motion aberration (the DNGR moving-camera physics;
James et al. 2015 appendix A) — beyond the reference, whose cameras are
always static."""
import jax.numpy as jnp
import numpy as np

import curvis_tpu as cv
from curvis_tpu.camera.camera import aberrate_directions


def _random_dirs(rng, n=512):
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return [jnp.asarray(d[:, i]) for i in range(3)]


def test_aberration_classical_formula(rng):
    """Vector form reduces to the textbook cos a' = (cos a - b)/(1 - b cos a)
    about the velocity axis, preserves unit norm and azimuth, and the
    Doppler factor is delta = 1 / (gamma (1 - beta cos a))."""
    dx, dy, dz = _random_dirs(rng)
    for beta in (0.3, 0.6, 0.9):
        v = jnp.asarray([0.0, 0.0, beta])          # motion along +z
        nx, ny, nz, delta = aberrate_directions(dx, dy, dz, v)
        norm = np.asarray(nx ** 2 + ny ** 2 + nz ** 2)
        np.testing.assert_allclose(norm, 1.0, atol=1e-12)
        c = np.asarray(dz)                         # cos(angle from +z)
        expect = (c - beta) / (1.0 - beta * c)
        np.testing.assert_allclose(np.asarray(nz), expect, atol=1e-12)
        gamma = 1.0 / np.sqrt(1.0 - beta * beta)
        np.testing.assert_allclose(np.asarray(delta),
                                   1.0 / (gamma * (1.0 - beta * c)),
                                   atol=1e-12)
        # azimuth about the boost axis is untouched
        np.testing.assert_allclose(np.asarray(ny) * np.asarray(dx),
                                   np.asarray(nx) * np.asarray(dy),
                                   atol=1e-12)


def test_aberration_zero_velocity_is_identity(rng):
    dx, dy, dz = _random_dirs(rng, 64)
    nx, ny, nz, delta = aberrate_directions(dx, dy, dz,
                                            jnp.zeros(3, jnp.float64))
    for a, b in ((nx, dx), (ny, dy), (nz, dz)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(delta), 1.0)


def test_flat_space_headlight_effect(rng):
    """Flat space, camera rushing toward -x at 0.6c: the static sky bunches
    toward the direction of motion (every looked-at feature moves toward
    the image centre) and the centre brightens by delta^3 ~ (gamma(1+b))^3.
    """
    from curvis_tpu.render.fast import render_planar_fast
    metric = cv.make_metric("flat")
    # bright disk painted around the -x direction (u wraps: phi=pi -> u=0
    # after the reference's (0.5 - phi/2pi) flip ... just paint a smooth
    # axisymmetric texture: brightness = angle from -x via the texture grid)
    h, w = 64, 128
    yy = np.linspace(0, np.pi, h)[:, None]
    xx = np.linspace(0, 2 * np.pi, w)[None, :]
    tex = np.repeat((0.1 * (0.5 + 0.4 * np.cos(yy))
                     * np.ones_like(xx))[..., None], 3, axis=-1)
    bg = cv.make_spherical_image(tex, dtype=jnp.float64)
    cam = cv.make_camera([0.0, 5.0, np.pi / 2, 0.0], [-1.0, 0.0, 0.0],
                         [0.0, 0.0, 1.0], 15.0, 43.0, 33, 25,
                         dtype=jnp.float64)
    kw = dict(dt=0.1, max_steps=2000, escape_radius=30.0, backend="tiled",
              filtering="bilinear", center_pixels=True)
    beta = 0.3
    base = np.asarray(render_planar_fast(metric, cam, bg, bg, **kw))
    moving = np.asarray(render_planar_fast(
        metric, cam, bg, bg, camera_velocity=[-beta, 0.0, 0.0], **kw))
    # velocity 0 (as an array) is the exact identity
    zero = np.asarray(render_planar_fast(
        metric, cam, bg, bg, camera_velocity=[0.0, 0.0, 0.0], **kw))
    np.testing.assert_array_equal(zero, base)
    # ON the motion axis (odd resolution + centered pixels -> the middle
    # pixel looks exactly along -x = beta-hat) the direction is unchanged
    # and only the Doppler boost delta^3 = (gamma (1 + beta))^3 acts:
    gamma = 1.0 / np.sqrt(1.0 - beta * beta)
    np.testing.assert_allclose(moving[12, 16], base[12, 16]
                               * (gamma * (1.0 + beta)) ** 3, rtol=1e-9)
    # off-axis, aberration actually moved the looked-at static direction
    assert np.abs(moving[12, 2] / base[12, 2]
                  - (gamma * (1.0 + beta)) ** 3).max() > 1e-3


def test_kerr_render_accepts_camera_velocity():
    """Kerr render with an orbiting-camera velocity: finite, differs from
    the static render, and zero velocity reproduces it exactly."""
    from curvis_tpu.metrics.kerr import make_kerr
    from curvis_tpu.render.kerr import render_kerr
    m = make_kerr(1.0, 0.9)
    m = type(m)(m=jnp.asarray(1.0, jnp.float64), a=jnp.asarray(0.9,
                                                               jnp.float64))
    th = np.pi / 2 - 0.2
    cam = cv.make_camera([0.0, 18.0, th, 0.0],
                         [-np.sin(th), 0.0, -np.cos(th)], [0.0, 0.0, 1.0],
                         30.0, 43.0, 16, 10, dtype=jnp.float64)
    rng = np.random.default_rng(3)
    bg = cv.make_spherical_image(rng.random((8, 16, 3)), dtype=jnp.float64)
    kw = dict(dt=0.1, max_steps=4000, escape_radius=40.0, backend="xla")
    base = np.asarray(render_kerr(m, cam, bg, **kw))
    zero = np.asarray(render_kerr(m, cam, bg,
                                  camera_velocity=[0.0, 0.0, 0.0], **kw))
    # the velocity path is a DIFFERENT compiled program: shadow-edge rays
    # amplify fusion-order ulps chaotically, so compare by mismatch
    # fraction, not bitwise (CLAUDE.md f32/f64 chaos note applies per ray)
    mismatch = (np.abs(zero - base).max(-1) > 1e-6).mean()
    assert mismatch < 0.05, mismatch
    moving = np.asarray(render_kerr(m, cam, bg,
                                    camera_velocity=[0.0, 0.4, 0.0], **kw))
    assert np.isfinite(moving).all()
    assert np.abs(moving - base).max() > 0.05


def test_kerr_frames_batched_with_velocities_matches_single():
    """Per-frame camera velocities through the frames-batched Kerr path
    equal the single-frame renders (pure concatenation, same trace)."""
    from curvis_tpu.metrics.kerr import KerrMetric
    from curvis_tpu.render.kerr import (render_kerr, render_kerr_frames_batched)
    m = KerrMetric(m=jnp.asarray(1.0, jnp.float64),
                   a=jnp.asarray(0.8, jnp.float64))
    th = np.pi / 2 - 0.2
    cams = [cv.make_camera([0.0, 18.0, th, 0.1 * k],
                           [-np.sin(th), 0.0, -np.cos(th)], [0.0, 0.0, 1.0],
                           30.0, 43.0, 12, 8, dtype=jnp.float64)
            for k in range(2)]
    rng = np.random.default_rng(5)
    bg = cv.make_spherical_image(rng.random((8, 16, 3)), dtype=jnp.float64)
    vels = [[0.0, 0.3, 0.0], [0.1, -0.2, 0.0]]
    kw = dict(dt=0.1, max_steps=3000, escape_radius=40.0, backend="xla")
    batch = np.asarray(render_kerr_frames_batched(
        m, cams, bg, camera_velocities=vels, **kw))
    for f in range(2):
        single = np.asarray(render_kerr(m, cams[f], bg,
                                        camera_velocity=vels[f], **kw))
        mismatch = (np.abs(batch[f] - single).max(-1) > 1e-6).mean()
        assert mismatch < 0.05, mismatch
