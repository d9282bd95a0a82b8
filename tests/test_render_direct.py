"""End-to-end renderer tests against analytic oracles."""
import jax.numpy as jnp
import numpy as np

import curvis_tpu as cv
from curvis_tpu.camera.camera import pixel_rays_world
from curvis_tpu.integrate.march import march
from curvis_tpu.render.direct import (escape_world_directions,
                                      spawn_pixel_photons)


def _bg(rng, h=32, w=64):
    return cv.make_spherical_image(rng.random((h, w, 3)), dtype=jnp.float64)


def _camera(forward, res=(48, 27)):
    return cv.make_camera([0.0, 5.0, np.pi / 2, 0.0], forward, [0.0, 0.0, 1.0],
                          15.0, 43.0, res[0], res[1], dtype=jnp.float64)


def test_flat_space_escape_directions_equal_ray_directions():
    """The analytic end-to-end oracle: in flat space (outward camera — inward
    rays hit the r=0 coordinate singularity of the *flat* chart), escaped
    photons travel exactly along their spawn directions."""
    cam = _camera([1.0, 0.3, 0.2])
    flat = cv.make_metric("flat")
    x0, p0 = spawn_pixel_photons(flat, cam)
    res = march(flat, x0, p0, dt=0.01, max_steps=100_000, escape_radius=100.0,
                backend="while", stepper="rk4")
    assert np.all(np.asarray(res.sign) == 1)
    w = np.asarray(escape_world_directions(flat, res))
    d = np.asarray(pixel_rays_world(cam))
    dots = np.clip((w * d).sum(-1), -1, 1)
    assert np.arccos(dots).max() < 1e-6


def test_flat_space_image_reproduces_background(rng):
    cam = _camera([1.0, 0.3, 0.2])
    flat = cv.make_metric("flat")
    bg_pos, bg_neg = _bg(rng), _bg(rng)
    img = cv.render_direct(flat, cam, bg_pos, bg_neg, dt=0.01,
                           max_steps=100_000, escape_radius=100.0,
                           backend="while", stepper="rk4")
    from curvis_tpu.env.spherical_image import sample_nearest
    d = pixel_rays_world(cam)
    want = np.asarray(sample_nearest(bg_pos, d)).reshape(
        cam.resolution_x, cam.resolution_y, 3).transpose(1, 0, 2)
    # identical up to texel-seam flips on ulp-level angular noise
    mismatch = (np.abs(np.asarray(img) - want).max(-1) > 1e-9).mean()
    assert mismatch < 0.01


def test_ellis_render_shows_both_universes(rng):
    """Phenomenology: camera facing the wormhole sees a central lensed disk of
    the negative universe inside an Einstein ring; no black pixels."""
    cam = _camera([-1.0, 0.0, 0.0], res=(64, 36))
    ellis = cv.make_metric("ellis", rho=1.0)
    h, w = 16, 32
    bg_pos = cv.make_spherical_image(
        np.broadcast_to([1.0, 0.0, 0.0], (h, w, 3)), dtype=jnp.float64)
    bg_neg = cv.make_spherical_image(
        np.broadcast_to([0.0, 0.0, 1.0], (h, w, 3)), dtype=jnp.float64)
    img = np.asarray(cv.render_direct(ellis, cam, bg_pos, bg_neg, dt=0.05,
                                      max_steps=40_000, escape_radius=100.0,
                                      backend="while"))
    frac_neg = (img[..., 2] > 0.5).mean()
    frac_black = (img.sum(-1) == 0).mean()
    assert 0.005 < frac_neg < 0.3
    assert frac_black < 0.01
    # the negative-universe disk is centered
    H, W = img.shape[:2]
    assert img[H // 2, W // 2, 2] > 0.5


def test_render_rows_are_image_rows(rng):
    """Pixel indexing parity: out[y, x] colors pixel (x, y) of the camera
    (systems.rs:513-514 linearization)."""
    cam = _camera([1.0, 0.0, 0.0], res=(8, 4))
    flat = cv.make_metric("flat")
    bg = _bg(rng)
    img = np.asarray(cv.render_direct(flat, cam, bg, bg, dt=0.05,
                                      max_steps=50_000, escape_radius=100.0,
                                      backend="while"))
    assert img.shape == (4, 8, 3)


def test_scene_api(rng):
    """Scene (the RelativisticSystem equivalent) exposes the reference's
    entry points."""
    from curvis_tpu.render.scene import Scene
    metric = cv.make_metric("ellis", rho=1.0)
    cam = _camera([-1.0, 0.0, 0.0], res=(24, 14))
    scene = Scene(metric, _bg(rng), _bg(rng), cam)
    img = np.asarray(scene.render_image(dt=0.05, max_steps=30_000,
                                        escape_radius=50.0))
    assert img.shape == (14, 24, 3)
    img2 = np.asarray(scene.render_image_efficient(
        dt=0.05, max_steps=30_000, escape_radius=50.0, alpha_nums=40,
        max_iterations_sampling=3))
    assert img2.shape == (14, 24, 3)
    a, s = scene.compute_escape_angle([0.0, np.pi])
    assert float(s[0]) == 1.0 and float(s[1]) == -1.0
    xs, ps = scene.compute_photon_trajectory([1.0, 0.0, 0.0], n_steps=10)
    assert xs.shape == (10, 4)
    # the scene is a pytree: jit over it whole
    import jax
    out = jax.jit(lambda sc: sc.render_image(dt=0.05, max_steps=5000,
                                             escape_radius=30.0))(scene)
    assert out.shape == (14, 24, 3)


def test_supersampling(rng):
    """supersample=2 box-filters a 2x-res render; mean brightness within a
    hair of the base render and shapes unchanged."""
    from curvis_tpu.render.fast import render_planar_fast
    metric = cv.make_metric("ellis", rho=1.0)
    cam = _camera([-1.0, 0.0, 0.0], res=(24, 14))
    bg = _bg(rng)
    kw = dict(dt=0.05, max_steps=30_000, escape_radius=50.0,
              backend="tiled", filtering="bilinear")
    a = np.asarray(render_planar_fast(metric, cam, bg, bg, **kw))
    b = np.asarray(render_planar_fast(metric, cam, bg, bg, supersample=2,
                                      **kw))
    assert b.shape == a.shape == (14, 24, 3)
    assert abs(a.mean() - b.mean()) < 0.05


def test_bilinear_pole_continuity():
    """Bilinear sampling is continuous across the poles (pole-reflect, not
    clamp): values just either side of straight-up agree closely, in both
    implementations (env.sample and the SoA _filter_lookup)."""
    import curvis_tpu as cv
    from curvis_tpu.env.spherical_image import sample
    from curvis_tpu.render.fast import _filter_lookup, _texture_uv
    rng2 = np.random.default_rng(5)
    tex = rng2.random((16, 32, 3))
    img = cv.make_spherical_image(tex, dtype=jnp.float64)
    eps = 1e-4
    # directions crossing the +z pole in the xz-plane: (sin e, 0, cos e) vs
    # (-sin e, 0, cos e) — half a turn apart in phi, adjacent across the pole
    d = jnp.asarray([[np.sin(eps), 0.0, np.cos(eps)],
                     [-np.sin(eps), 0.0, np.cos(eps)],
                     [np.sin(eps), 0.0, -np.cos(eps)],
                     [-np.sin(eps), 0.0, -np.cos(eps)]])
    c = np.asarray(sample(img, d, filtering="bilinear"))
    assert np.abs(c[0] - c[1]).max() < 5e-3        # north pole continuous
    assert np.abs(c[2] - c[3]).max() < 5e-3        # south pole continuous
    # SoA path agrees with env.sample exactly
    u, v = _texture_uv(img, d[:, 0], d[:, 1], d[:, 2])
    c2 = np.asarray(_filter_lookup(img.texture.reshape(-1, 3),
                                   jnp.zeros(4, jnp.int32), u, v, 32, 16,
                                   "bilinear"))
    np.testing.assert_allclose(c, c2, atol=1e-12)


def test_planar_adaptive_antialiasing(rng):
    """Edge-adaptive planar supersampler: <= refine_frac pixels change,
    the rest match the base render bitwise, and total variation drops
    (the reference's documented rim-aliasing fix, README.md:108)."""
    from curvis_tpu.render.fast import (render_planar_adaptive,
                                        render_planar_fast)
    metric = cv.EllisMetric(rho=jnp.asarray(1.0, jnp.float64))
    cam = cv.make_camera([0.0, 5.0, np.pi / 2, 0.0], [-1.0, 0.0, 0.0],
                         [0.0, 0.0, 1.0], 15.0, 43.0, 48, 28,
                         dtype=jnp.float64)
    bgp = cv.make_spherical_image(rng.random((16, 32, 3)),
                                  dtype=jnp.float64)
    bgn = cv.make_spherical_image(rng.random((16, 32, 3)),
                                  dtype=jnp.float64)
    kw = dict(dt=0.05, max_steps=5000, escape_radius=30.0,
              backend="tiled", filtering="bilinear")
    base = np.asarray(render_planar_fast(metric, cam, bgp, bgn, **kw))
    ad = np.asarray(render_planar_adaptive(metric, cam, bgp, bgn,
                                           refine_frac=0.15, supersample=3,
                                           **kw))
    changed = np.abs(ad - base).max(-1) > 0
    assert changed.mean() <= 0.15 + 1e-9
    assert np.array_equal(ad[~changed], base[~changed])
    tv = lambda im: (np.abs(np.diff(im, axis=0)).sum()
                     + np.abs(np.diff(im, axis=1)).sum())
    assert tv(ad) < tv(base)
