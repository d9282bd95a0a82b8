"""Symmetric (1-D reduction) renderer: parity semantics + agreement with the
direct per-pixel renderer."""
import jax.numpy as jnp
import numpy as np

import curvis_tpu as cv
from curvis_tpu.metrics.base import EllisMetric
from curvis_tpu.render.symmetric import (compute_escape_angles,
                                         render_symmetric,
                                         sample_deflection_function)


def _scene(rng, res=(96, 54)):
    metric = EllisMetric(rho=jnp.asarray(1.0))
    cam = cv.make_camera([0.0, 5.0, np.pi / 2, 0.0], [-1.0, 0.0, 0.0],
                         [0.0, 0.0, 1.0], 15.0, 43.0, res[0], res[1],
                         dtype=jnp.float64)
    h, w = 64, 128
    yy, xx = np.mgrid[0:h, 0:w]
    smooth = np.stack([xx / w, yy / h, 0.5 + 0 * xx], -1)
    bg_p = cv.make_spherical_image(smooth, dtype=jnp.float64)
    bg_n = cv.make_spherical_image(smooth[::-1].copy(), dtype=jnp.float64)
    return metric, cam, bg_p, bg_n


KW = dict(dt=0.05, max_steps=40_000, escape_radius=100.0)


def test_escape_angle_radial_cases():
    metric = EllisMetric(rho=jnp.asarray(1.0))
    a, s = compute_escape_angles(metric, 5.0, jnp.array([0.0, np.pi]), **KW)
    # outward radial: no deflection, positive space
    assert float(s[0]) == 1.0 and abs(float(a[0])) < 1e-9
    # inward radial: through the throat, negative space, angle pi
    assert float(s[1]) == -1.0 and abs(float(a[1]) - np.pi) < 1e-9


def test_escape_angle_reference_formula_vs_exact():
    """The reference's acos-based readout is an O(b/R) approximation of the
    exact in-plane angle — close but not equal for non-radial rays."""
    metric = EllisMetric(rho=jnp.asarray(1.0))
    alphas = jnp.asarray(np.linspace(0.2, 2.9, 7))
    a_ref, s1 = compute_escape_angles(metric, 5.0, alphas, **KW)
    a_ex, s2 = compute_escape_angles(metric, 5.0, alphas,
                                     exact_escape_angle=True, **KW)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    d = np.abs(np.asarray(a_ref) - np.asarray(a_ex))
    assert d.max() < 0.06       # bounded by ~ b_max / R
    assert d.max() > 1e-6       # and genuinely different


def test_sampling_refines_near_critical_angle():
    """The deflection function diverges at the critical impact parameter;
    the sampler must concentrate points there (sampling.rs rationale)."""
    metric = EllisMetric(rho=jnp.asarray(1.0))
    alphas, angles, spaces = sample_deflection_function(
        metric, 5.0, alpha_nums=50, max_iterations_sampling=12,
        threshold_1=1e-3, threshold_2=1e-3, **KW)
    assert len(alphas) > 60              # refinement actually happened
    assert np.all(np.isfinite(angles))   # cleaned
    assert set(np.unique(spaces)) <= {1.0, -1.0}
    # density near the space transition should exceed the initial density
    flip = np.where(np.diff(spaces) != 0)[0]
    assert len(flip) >= 1
    a_crit = alphas[flip[0]]
    win = (alphas > a_crit - 0.05) & (alphas < a_crit + 0.05)
    base_density = 50 / (1.2 * np.pi)
    assert win.sum() / 0.1 > 2 * base_density


def test_symmetric_matches_direct_renderer(rng):
    """Quality-mode symmetric render (exact angles, seam=nearest_side,
    bilinear) must closely match the direct per-pixel renderer."""
    metric, cam, bg_p, bg_n = _scene(rng)
    img_d = np.asarray(cv.render_direct(metric, cam, bg_p, bg_n,
                                        method="planar",
                                        filtering="bilinear", **KW))
    img_s = np.asarray(render_symmetric(metric, cam, bg_p, bg_n,
                                        alpha_nums=200,
                                        max_iterations_sampling=20,
                                        sampling_convergence_threshold_1=1e-5,
                                        sampling_convergence_threshold_2=1e-5,
                                        filtering="bilinear",
                                        seam="nearest_side",
                                        exact_escape_angle=True, **KW))
    d = np.abs(img_d - img_s).max(-1)
    # agreement everywhere except the seam ring (interpolation across the
    # space flip) — tolerate <2% of pixels above tolerance
    assert (d > 0.02).mean() < 0.02
    assert np.median(d) < 1e-3


def test_symmetric_parity_mode_black_seam(rng):
    """Reference parity: seam pixels (interpolated space not exactly +-1)
    are black (systems.rs:516-520, README.md:108)."""
    # coarse sampling (no refinement) -> the seam window between the two
    # samples bracketing the space flip is wide enough to catch pixel alphas
    metric, cam, bg_p, bg_n = _scene(rng, res=(128, 72))
    img = np.asarray(render_symmetric(metric, cam, bg_p, bg_n,
                                      alpha_nums=40,
                                      max_iterations_sampling=0,
                                      filtering="nearest", seam="exact", **KW))
    black = (img.sum(-1) == 0)
    assert black.any()                   # the documented seam exists
    assert black.mean() < 0.2            # but is a thin ring


def test_dense_sampler_mode(rng):
    """sampler='dense' (one batched march) matches the adaptive sampler's
    image away from the seam."""
    metric, cam, bg_p, bg_n = _scene(rng, res=(64, 36))
    a = np.asarray(render_symmetric(metric, cam, bg_p, bg_n, alpha_nums=200,
                                    max_iterations_sampling=20,
                                    filtering="bilinear",
                                    seam="nearest_side",
                                    exact_escape_angle=True, **KW))
    b = np.asarray(render_symmetric(metric, cam, bg_p, bg_n, sampler="dense",
                                    dense_n=4096, filtering="bilinear",
                                    seam="nearest_side",
                                    exact_escape_angle=True, **KW))
    d = np.abs(a - b).max(-1)
    assert np.median(d) < 2e-3
    assert (d > 0.05).mean() < 0.03


def test_device_sampler_control_flow_bitparity():
    """The on-device sampler's refinement bookkeeping (triple scan, i+=2
    skip, tail drop, NaN clean, termination) must be bit-identical to the
    host sampler.  Uses an exact-arithmetic oracle (only correctly-rounded
    +,-,*,/ ops, so numpy and XLA agree bitwise) to isolate control flow
    from XLA fusion-context rounding in the geodesic march."""
    import jax
    from curvis_tpu.sampling.adaptive import doubly_sample_function
    from curvis_tpu.sampling.device import doubly_sample_on_device

    def oracle_np(a):
        e = 1.0 / (a - 0.37)
        e = np.where(np.abs(a - 1.5) < 0.04, np.nan, e)
        s = np.where(a > 1.5, 1.0, -1.0)
        return e, s

    def oracle_jnp(a):
        e = 1.0 / (a - 0.37)
        e = jnp.where(jnp.abs(a - 1.5) < 0.04, jnp.nan, e)
        s = jnp.where(a > 1.5, 1.0, -1.0)
        return e, s

    ah, eh, sh = doubly_sample_function(-0.1 * np.pi, 1.1 * np.pi, 50, 30,
                                        1e-3, 1e-3, oracle_np)
    ad, ed, sd, n, ovf = jax.jit(lambda: doubly_sample_on_device(
        oracle_jnp, -0.1 * np.pi, 1.1 * np.pi, 50, 30, 1e-3, 1e-3,
        capacity=4096, march_width=256, dtype=jnp.float64))()
    n = int(n)
    assert not bool(ovf)
    assert n == len(ah)
    np.testing.assert_array_equal(ah, np.asarray(ad)[:n])
    np.testing.assert_array_equal(eh, np.asarray(ed)[:n])
    np.testing.assert_array_equal(sh, np.asarray(sd)[:n])
    assert n > 60                      # refinement happened


def test_device_sampler_overflow_flag_no_zero_injection():
    """Overflow safety (ADVICE round-2 medium + VERDICT round-2 weak #6):
    midpoints beyond march_width degrade to 'not refined' — they are never
    kept with their 0.0 initialization — and both march_width and capacity
    overflow raise the returned flag."""
    import jax
    from curvis_tpu.sampling.device import doubly_sample_on_device

    def oracle(a):
        # escape angle bounded away from 0 so an injected 0.0 is detectable
        e = 5.0 + jnp.sin(7.0 * a) / (jnp.abs(a - 1.5) + 1e-3)
        s = jnp.where(a > 1.5, 1.0, -1.0)
        return e, s

    # march_width far below the midpoint demand of the tight thresholds
    # (the buffer grows each pass, so midpoint demand soon exceeds 8)
    a, e, s, n, ovf = jax.jit(lambda: doubly_sample_on_device(
        oracle, -0.1 * np.pi, 1.1 * np.pi, 8, 10, 1e-6, 1e-6,
        capacity=4096, march_width=8, dtype=jnp.float64))()
    n = int(n)
    assert bool(ovf)
    assert n >= 3
    e_live = np.asarray(e)[:n]
    s_live = np.asarray(s)[:n]
    assert np.all(e_live != 0.0), "un-marched midpoints leaked as 0.0"
    assert np.all(np.abs(s_live) == 1.0)

    # capacity overflow raises the flag too
    *_, ovf2 = jax.jit(lambda: doubly_sample_on_device(
        oracle, -0.1 * np.pi, 1.1 * np.pi, 50, 10, 1e-6, 1e-6,
        capacity=64, march_width=64, dtype=jnp.float64))()
    assert bool(ovf2)


def test_device_sampler_matches_host():
    """Device vs host sampler on the real geodesic march: same refinement
    structure and samples to ~1e-12 (XLA fuses the inlined march slightly
    differently than the standalone host dispatch, so exact bit-parity is
    checked by the oracle test above, not here)."""
    from curvis_tpu.render.symmetric import sample_deflection_function_device
    metric = EllisMetric(rho=jnp.asarray(1.0))
    kw = dict(dt=0.05, max_steps=4000, escape_radius=20.0,
              alpha_nums=60, max_iterations_sampling=25,
              threshold_1=1e-4, threshold_2=1e-4)
    ah, eh, sh = sample_deflection_function(metric, 5.0, **kw)
    ad, ed, sd = sample_deflection_function_device(metric, 5.0,
                                                   march_width=256, **kw)
    assert len(ah) == len(ad)
    np.testing.assert_allclose(ah, ad, rtol=0, atol=1e-12)
    np.testing.assert_allclose(eh, ed, rtol=0, atol=1e-12)
    np.testing.assert_array_equal(sh, sd)
    assert len(ah) > 70          # refinement actually happened


def test_device_sampler_frames_matches_single():
    """Frame-batched device sampler == F independent single-frame runs on
    CPU f64: identical refinement structure/counts, samples to ~1e-12 (the
    flat F*M march fuses slightly differently than the single-frame M march,
    so escapes can differ by an ulp — same caveat as
    test_device_sampler_matches_host)."""
    import jax
    from curvis_tpu.render.symmetric import (ALPHA_MAX, ALPHA_MIN,
                                             compute_escape_angles)
    from curvis_tpu.sampling.device import (doubly_sample_on_device,
                                            doubly_sample_on_device_frames)
    metric = EllisMetric(rho=jnp.asarray(1.0))
    l0s = np.array([5.0, 3.5, 7.25])
    kw = dict(dt=0.05, max_steps=4000, escape_radius=20.0)
    M = 256

    def march_flat(a_flat):
        l0_flat = jnp.repeat(jnp.asarray(l0s, jnp.float64), M)
        return compute_escape_angles(metric, l0_flat, a_flat, **kw)

    ab, eb, sb, nb, _ = jax.jit(lambda: doubly_sample_on_device_frames(
        march_flat, ALPHA_MIN, ALPHA_MAX, 60, 25, 1e-4, 1e-4,
        n_frames=len(l0s), capacity=1024, march_width=M,
        dtype=jnp.float64))()
    for f, l0 in enumerate(l0s):
        def march_one(a, l0=l0):
            return compute_escape_angles(metric, l0, a, **kw)
        a1, e1, s1, n1, _ = jax.jit(lambda m=march_one: doubly_sample_on_device(
            m, ALPHA_MIN, ALPHA_MAX, 60, 25, 1e-4, 1e-4, capacity=1024,
            march_width=M, dtype=jnp.float64))()
        n = int(n1)
        assert int(nb[f]) == n
        np.testing.assert_allclose(np.asarray(ab[f])[:n],
                                   np.asarray(a1)[:n], rtol=0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(eb[f])[:n],
                                   np.asarray(e1)[:n], rtol=0, atol=1e-12)
        np.testing.assert_array_equal(np.asarray(sb[f])[:n],
                                      np.asarray(s1)[:n])
        assert n > 60                  # refinement happened per frame


def test_symmetric_frames_batched_matches_single(rng):
    """render_symmetric_frames_batched ~= per-frame sampler='device' renders
    (one device call for the whole batch; CPU f64; ulp-level tolerance for
    the flat F*M march's different XLA fusion)."""
    from curvis_tpu.render.symmetric import render_symmetric_frames_batched
    metric, _, bg_p, bg_n = _scene(rng)
    kw2 = dict(dt=0.05, max_steps=4000, escape_radius=20.0, alpha_nums=60,
               max_iterations_sampling=15,
               sampling_convergence_threshold_1=1e-4,
               sampling_convergence_threshold_2=1e-4,
               filtering="bilinear", seam="nearest_side", march_width=256)
    cams = [cv.make_camera([0.0, l0, np.pi / 2, phi], [-1.0, 0.0, 0.0],
                           [0.0, 0.0, 1.0], 15.0, 43.0, 64, 36,
                           dtype=jnp.float64)
            for l0, phi in [(5.0, 0.0), (4.0, 0.7), (6.5, -0.3)]]
    batch = np.asarray(render_symmetric_frames_batched(
        metric, cams, bg_p, bg_n, **kw2))
    assert batch.shape == (3, 36, 64, 3)
    for f, cam in enumerate(cams):
        single = np.asarray(render_symmetric(metric, cam, bg_p, bg_n,
                                             sampler="device", **kw2))
        np.testing.assert_allclose(batch[f], single, rtol=0, atol=1e-12)


def test_device_render_matches_adaptive_render(rng):
    """sampler='device' image ~= sampler='adaptive' image on CPU f64 (the
    production one-dispatch path vs the host-driven parity path; ulp-level
    march differences allow rare marginal refinement flips)."""
    metric, cam, bg_p, bg_n = _scene(rng, res=(64, 36))
    kw2 = dict(alpha_nums=80, max_iterations_sampling=15,
               sampling_convergence_threshold_1=1e-4,
               sampling_convergence_threshold_2=1e-4,
               filtering="bilinear", seam="nearest_side",
               dt=0.05, max_steps=4000, escape_radius=20.0)
    a = np.asarray(render_symmetric(metric, cam, bg_p, bg_n,
                                    sampler="adaptive", **kw2))
    b = np.asarray(render_symmetric(metric, cam, bg_p, bg_n,
                                    sampler="device", march_width=256, **kw2))
    d = np.abs(a - b).max(-1)
    assert np.median(d) < 1e-6
    assert (d > 0.02).mean() < 0.01
