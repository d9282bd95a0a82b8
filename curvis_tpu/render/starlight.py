"""Starlight on the disk — the lensed background sky illuminating the
accretion-disk surface (the reflected component the emission-only shaders
omit; the round-2 backlog's last genuinely open rendering item).

Physical model: each disk face is a Lambertian reflector with albedo rho.
The radiance it reflects toward ANY outgoing direction is

    L_out(x) = rho / pi * E(x),    E(x) = int_hemi L_in(x, w) cos(th) dw

where L_in is the sky radiance arriving at x along the true (curved) photon
path: light bent around the hole illuminates the far side of the disk, rays
into the horizon contribute nothing (the hole casts a shadow ON the disk),
the annulus can shadow itself, and infalling starlight is gravitationally
blueshifted (Liouville: bolometric I scales as (nu_loc / nu_inf)^4 = A^-2
for lapse A).  The reflected light then picks up the same redshift/Doppler
factor as the disk's own emission on its way to the camera (applied by the
disk shader, render/disk.py:_emission_rgb).

TPU-native design — spherical symmetry collapses the illumination integral:
the reduced planar orbit of a secondary ray depends only on (launch radius
r, launch angle alpha from the radial direction), never on WHERE on the
disk it starts or which face it leaves.  A cosine-weighted hemisphere
sample set defined in the local (r_hat, phi_hat, n_hat) surface frame has a
fixed alpha per sample, so ONE march of n_r x K reduced rays covers every
disk point, both faces, and every azimuth: the map value at (side, r_i,
phi_j) is a pure basis rotation of the per-(i, k) in-plane escape angles
followed by equirect lookups.  Marching cost is independent of the map's
phi resolution and of the image resolution — the default 48 x 128 table
marches 6k rays, under 1%% of one 512x288 frame — and the map is valid for
every camera pose, so video batches amortize it to ~zero.

Cosine-weighted sampling makes the estimator trivial: E = pi * mean_k(L_k),
so the map stores mean_k(L_k) = E / pi and the reflected radiance is just
albedo * map — no pi bookkeeping anywhere downstream.

Secondary rays that neither escape nor get captured within the step budget
(bound photon orbits, measure zero) contribute black.  The self-shadow
attenuation uses the thin-disk alpha model at the first two annulus
crossings of each secondary ray — the same two-crossing truncation the
primary renderer uses.

This capability has no analogue in the reference (no disks at all:
/root/reference/README.md:111-113) nor in its wishlist.

Two-sheet wormholes (round 5): planar disk marchers record SIGNED hit
coordinates (|l| = radius, sign = sheet), and ``two_sheet=True`` computes
a second table for the l -> -l MIRRORED metric with the two skies swapped
— exact for asymmetric user tables, whose far-sheet illumination differs
by that sheet's own r(l) profile (the l -> -l symmetric Ellis/DNEG shapes
make the sheets identical, which the defaults exploit by storing one).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from curvis_tpu.metrics.base import Metric
from curvis_tpu.physics import planar as pl
from curvis_tpu.render.fast import _shade_soa


class StarlightMap(NamedTuple):
    """Reflected-sky map over the disk: values[(1-side)//2, i, j] is
    E / pi (mean incident radiance under cosine weighting) at radius
    radii[i], world azimuth 2 pi j / n_phi, on the +z (index 0) or -z
    (index 1) face.  ``values_neg`` (optional): the NEGATIVE-sheet table
    of a two-sheet wormhole map (asymmetric user metrics); hits select
    their sheet by the sign of the recorded hit coordinate."""
    radii: jax.Array        # (n_r,)
    values: jax.Array       # (2, n_r, n_phi, 3)
    values_neg: jax.Array | None = None


def mirror_metric(metric):
    """The l -> -l mirrored metric: r_m(l) = r(-l).  Identity for the
    symmetric families (Ellis/DNEG/flat); for a TabulatedMetric the
    Chebyshev parity flip c1[k] -> (-1)^k c1[k], c2[k] -> -(-1)^k c2[k]
    (the c2 table carries r', which is odd under the reflection)."""
    from curvis_tpu.metrics.table import TabulatedMetric
    if isinstance(metric, TabulatedMetric):
        import dataclasses
        alt = jnp.asarray((-1.0) ** np.arange(metric.c1.shape[0]),
                          metric.c1.dtype)
        return dataclasses.replace(metric, c1=metric.c1 * alt,
                                   c2=-metric.c2 * alt)
    return metric


def _cosine_hemisphere(n_samples: int):
    """Deterministic cosine-weighted hemisphere set around the face normal
    n_hat, in local (r_hat, phi_hat, n_hat) coordinates (a_r, a_p, a_n):
    a Fibonacci lattice in (u, phi) with cos(th) = sqrt(1 - u) — the
    standard cosine warp, quasi-random so K samples integrate smooth skies
    at ~1/K instead of 1/sqrt(K)."""
    k = np.arange(n_samples)
    u = (k + 0.5) / n_samples
    ang = np.pi * (3.0 - np.sqrt(5.0)) * k          # golden angle
    sin_t = np.sqrt(u)
    a_n = np.sqrt(1.0 - u)                          # cos(th) > 0: upper hemi
    a_r = sin_t * np.cos(ang)
    a_p = sin_t * np.sin(ang)
    return a_r, a_p, a_n


def hit_phi_side(r_hit, psi_hit, b, c1, c2, e1, e2):
    """World azimuth and approach side of a recorded disk crossing.

    ``e1``, ``e2``: per-ray orbital-plane basis as component tuples
    ((x, y, z) each).  The hit position is p = r_hit (e1 cos psi +
    e2 sin psi); its azimuth is atan2(p_y, p_x).  The approach side is the
    sign of z just BEFORE the crossing: psi advances monotonically with
    sign(b) and z = r (c1 cos psi + c2 sin psi), so sign(z_before) =
    -sign(b) sign(d(zq)/dpsi) = -sign(b) sign(c2 cos psi - c1 sin psi)
    evaluated at the crossing.  Returns (phi_world, side) with side in
    {+1.0, -1.0} (meaningless where r_hit == 0)."""
    cu = jnp.cos(psi_hit)
    sv = jnp.sin(psi_hit)
    px = e1[0] * cu + e2[0] * sv
    py = e1[1] * cu + e2[1] * sv
    phi = jnp.arctan2(py, px)
    dz = c2 * cu - c1 * sv
    side = -jnp.sign(b) * jnp.sign(dz)
    side = jnp.where(side == 0.0, 1.0, side)
    return phi, side


def compute_disk_starlight_map(
        metric: Metric, bg_positive, bg_negative=None, *, r_inner, r_outer,
        escape_radius, dt=0.02, max_steps=100_000, n_r=48, n_phi=128,
        n_samples=128, filtering="bilinear", sample_filtering="nearest",
        backend="while", stepper="euler", rtol=1e-5, blueshift=True,
        shadow_params=None, interpret=False,
        two_sheet=False) -> StarlightMap:
    """March the (n_r x n_samples) reduced secondary-ray table and expand
    it to the (2, n_r, n_phi, 3) reflected-sky map (module docstring).

    ``shadow_params`` (a render/disk.DiskParams or None): when given, each
    secondary ray is attenuated by (1 - alpha) at its first two annulus
    crossings using the thin-disk alpha model — the disk shadowing itself.
    ``backend``/``stepper`` mirror render_blackhole_disk's knobs (the map
    march reuses the same kernels).  Everything is jittable; n_r / n_phi /
    n_samples / backend / stepper are static.

    ``sample_filtering``: texture filter for the per-sample sky lookups.
    Each map texel AVERAGES n_samples lookups, so per-sample bilinear is
    invisible in the result while costing 4x the gathers — and the gathers
    dominate the map's on-chip cost (measured 104 -> ~55 ms at the
    64x128xK=256 hero config).  ``filtering`` is kept for the rare
    n_samples ~ O(1) use.
    """
    dtype = bg_positive.texture.dtype
    if bg_negative is None:
        bg_negative = bg_positive
    rr = jnp.linspace(jnp.asarray(r_inner, dtype),
                      jnp.asarray(r_outer, dtype), n_r)
    a_r, a_p, a_n = _cosine_hemisphere(n_samples)
    a_r = jnp.asarray(a_r, dtype)
    a_p = jnp.asarray(a_p, dtype)
    a_n = jnp.asarray(a_n, dtype)

    # reduced spawn at (r_i, alpha_k): the planar specialization of
    # physics/planar.spawn_planar with per-ray launch radius
    l0 = jnp.broadcast_to(rr[:, None], (n_r, n_samples)).reshape(-1)
    cos_a = jnp.broadcast_to(a_r[None, :], (n_r, n_samples)).reshape(-1)
    sin_a = jnp.sqrt(jnp.maximum(1.0 - cos_a * cos_a, 0.0))
    r0 = metric.r(l0)
    p_l0 = cos_a
    b0 = sin_a * r0
    if not pl._unit_lapse(metric):
        A0 = metric.lapse(l0)
        B0 = metric.radial_B(l0)
        p_l0 = cos_a * jnp.sqrt(B0 / A0)
        b0 = b0 / jnp.sqrt(A0)
    dummy = jnp.zeros((1, 3), dtype)
    rays = pl.PlanarRays(l0, jnp.zeros_like(l0), p_l0, b0, dummy, dummy)

    # march with annulus-crossing capture (c1 = 0, c2 = 1: the launch point
    # sits ON the plane, so crossings are at psi = m pi for every sample —
    # the canonical plane coefficients are sample-independent)
    c1 = jnp.zeros_like(l0)
    c2 = jnp.ones_like(l0)
    kw = dict(max_steps=max_steps, escape_radius=escape_radius)
    if stepper == "rk45":
        kw45 = dict(dt0=dt, rtol=rtol, atol=rtol * 1e-3,
                    disk=(r_inner, r_outer), c1=c1, c2=c2, **kw)
        if backend == "pallas":
            from curvis_tpu.ops.march_pallas import march_planar_rk45_pallas
            res, h1, h2 = march_planar_rk45_pallas(metric, rays,
                                                   interpret=interpret,
                                                   **kw45)
        else:
            from curvis_tpu.integrate.rk45 import march_planar_rk45
            res, h1, h2 = march_planar_rk45(metric, rays, **kw45)
    elif backend == "pallas":
        from curvis_tpu.ops.march_pallas import march_planar_disk_pallas
        res, h1, h2 = march_planar_disk_pallas(
            metric, rays, c1, c2, dt=dt, r_inner=r_inner, r_outer=r_outer,
            interpret=interpret, **kw)
    else:
        from curvis_tpu.render.disk import march_planar_disk
        res, h1, h2 = march_planar_disk(
            metric, rays, c1, c2, dt=dt, r_inner=r_inner, r_outer=r_outer,
            **kw)

    beta = pl.escape_angle_beta(metric, res, b0).reshape(n_r, n_samples)
    sign = res.sign.reshape(n_r, n_samples)

    # self-shadow: Beer attenuation at the first two annulus crossings
    att = jnp.ones((n_r, n_samples), dtype)
    if shadow_params is not None:
        from curvis_tpu.render.disk import _emission_rgb
        g1 = jnp.ones_like(h1[0])
        _, alpha1 = _emission_rgb(jnp.abs(h1[0]), g1, shadow_params, dtype)
        _, alpha2 = _emission_rgb(jnp.abs(h2[0]), g1, shadow_params, dtype)
        att = ((1.0 - alpha1) * (1.0 - alpha2)).reshape(n_r, n_samples)

    # expand: w(side, i, j, k) = cos(beta_ik) r_hat_j + sin(beta_ik) t_hat
    # with t_hat = (a_p phi_hat_j + a_n side z_hat) / sin(alpha_k)
    pp = (2.0 * jnp.pi / n_phi) * jnp.arange(n_phi, dtype=dtype)
    cj = jnp.cos(pp)[None, None, :, None]           # (1, 1, n_phi, 1)
    sj = jnp.sin(pp)[None, None, :, None]
    cb = jnp.cos(beta)[None, :, None, :]            # (1, n_r, 1, K)
    sb = jnp.sin(beta)[None, :, None, :]
    inv_s = (1.0 / jnp.maximum(sin_a.reshape(n_r, n_samples), 1e-12)
             )[None, :, None, :]
    apk = a_p[None, None, None, :]
    ank = a_n[None, None, None, :]
    sides = jnp.asarray([1.0, -1.0], dtype)[:, None, None, None]
    shape = (2, n_r, n_phi, n_samples)
    wx = jnp.broadcast_to(cb * cj + sb * inv_s * apk * (-sj), shape)
    wy = jnp.broadcast_to(cb * sj + sb * inv_s * apk * cj, shape)
    wz = jnp.broadcast_to(sb * inv_s * ank * sides, shape)
    esc_pos = (sign == 1)[None, :, None, :]
    esc_neg = (sign == -1)[None, :, None, :]
    flat = (-1,)
    L = _shade_soa(bg_positive, wx.reshape(flat), wy.reshape(flat),
                   wz.reshape(flat), sample_filtering).reshape(shape + (3,))
    L = jnp.where(jnp.broadcast_to(esc_pos, shape)[..., None], L, 0.0)
    if pl._capture_radius(metric) is None:
        Ln = _shade_soa(bg_negative, wx.reshape(flat), wy.reshape(flat),
                        wz.reshape(flat),
                        sample_filtering).reshape(shape + (3,))
        L = jnp.where(jnp.broadcast_to(esc_neg, shape)[..., None], Ln, L)
    L = L * att[None, :, None, :, None]
    E = jnp.mean(L, axis=3)                          # (2, n_r, n_phi, 3)
    if blueshift and not pl._unit_lapse(metric):
        A = jnp.clip(metric.lapse(rr), 1e-3, 1.0)
        E = E * (1.0 / (A * A))[None, :, None, None]
    values_neg = None
    if two_sheet:
        # the negative sheet's own table: the l -> -l mirrored metric with
        # the two universes' skies swapped (escaping 'outward' from the
        # negative sheet reaches bg_negative; through the throat,
        # bg_positive).  Exact for asymmetric tabulated r(l).
        if pl._capture_radius(metric) is not None:
            raise ValueError("two_sheet=True needs a two-universe "
                             "(capture-free) metric")
        neg = compute_disk_starlight_map(
            mirror_metric(metric), bg_negative, bg_positive,
            r_inner=r_inner, r_outer=r_outer, escape_radius=escape_radius,
            dt=dt, max_steps=max_steps, n_r=n_r, n_phi=n_phi,
            n_samples=n_samples, filtering=filtering,
            sample_filtering=sample_filtering, backend=backend,
            stepper=stepper, rtol=rtol, blueshift=blueshift,
            shadow_params=shadow_params, interpret=interpret,
            two_sheet=False)
        values_neg = neg.values
    return StarlightMap(radii=rr, values=E, values_neg=values_neg)


def compute_kerr_starlight_map(
        metric, bg, *, r_inner, r_outer, escape_radius, dt=0.1,
        max_steps=20_000, n_r=48, n_phi=128, n_samples=128,
        sample_filtering="nearest", backend="auto", stepper="rk4",
        rtol=1e-4, boost="static", shadow_params=None, far_accel=True,
        interpret=False) -> StarlightMap:
    """The lensed-sky illumination map of a KERR/KN accretion disk —
    the axisymmetric generalization of :func:`compute_disk_starlight_map`
    (VERDICT round-4 next-step #2: 'the frame-dragged Gargantua with
    starlit disk').

    Kerr has no spherical symmetry, but it is STATIONARY and AXISYMMETRIC:
    the escape direction of a secondary ray launched at disk azimuth phi0
    is the phi0 = 0 ray's escape direction rotated by phi0 about the spin
    axis, and the z -> -z equatorial reflection maps the -z face's
    hemisphere onto the +z face's marches.  So ONE (n_r x n_samples)
    bundle of full Boyer-Lindquist marches (~6k rays at the default 48 x
    128 — cheaper than a single small frame) covers both faces and every
    azimuth; the (2, n_r, n_phi, 3) map is pure rotation + equirect
    lookups on top, exactly the planar scheme.

    Physics per sample: a cosine-weighted hemisphere direction in the
    LOCAL STATIC frame at (r, pi/2, 0), spawned with local energy 1
    (physics/hamiltonian.spawn_photon), marched to escape/capture with
    annulus-crossing capture for the self-shadow.  The incident bolometric
    boost is **E^-4 per sample** (Liouville: I/nu^4 invariant; nu_loc = 1
    by normalization, nu_inf = E = -p_t) — this is the frame-dragged
    generalization of the planar map's radial A^-2: at a = 0 the static
    E = sqrt(A) exactly, and at a != 0 prograde/retrograde samples pick up
    the dragging asymmetry.  Captured samples contribute black (the hole
    shadows its own disk); ``shadow_params`` adds the thin-disk Beer
    attenuation at the first two annulus crossings.

    The map is camera-independent: compute once per (metric, sky, disk)
    and pass to render_kerr(starlight_map=...) for every frame."""
    if backend == "auto":
        from curvis_tpu.integrate.march import _on_tpu
        backend = "pallas" if (_on_tpu() or interpret) else "xla"
    return _kerr_map_jit(metric, bg, jnp.asarray(r_inner),
                         jnp.asarray(r_outer), jnp.asarray(escape_radius),
                         jnp.asarray(dt), max_steps=max_steps, n_r=n_r,
                         n_phi=n_phi, n_samples=n_samples,
                         sample_filtering=sample_filtering, backend=backend,
                         stepper=stepper, rtol=rtol, boost=boost,
                         shadow_params=shadow_params, far_accel=far_accel,
                         interpret=interpret)


def _kerr_map_impl(metric, bg, r_inner, r_outer, escape_radius, dt, *,
                   max_steps, n_r, n_phi, n_samples, sample_filtering,
                   backend, stepper, rtol, boost, shadow_params, far_accel,
                   interpret):
    from curvis_tpu.physics import hamiltonian as ham
    from curvis_tpu.render.kerr import _asymptotic_dirs, march_kerr_disk
    dtype = bg.texture.dtype
    rr = jnp.linspace(jnp.asarray(r_inner, dtype),
                      jnp.asarray(r_outer, dtype), n_r)
    a_r, a_p, a_n = _cosine_hemisphere(n_samples)
    a_r = jnp.asarray(a_r, dtype)
    a_p = jnp.asarray(a_p, dtype)
    a_n = jnp.asarray(a_n, dtype)

    N = n_r * n_samples
    r0 = jnp.broadcast_to(rr[:, None], (n_r, n_samples)).reshape(-1)
    x0 = jnp.stack([jnp.zeros((N,), dtype), r0,
                    jnp.full((N,), jnp.pi / 2, dtype),
                    jnp.zeros((N,), dtype)], axis=-1)
    # +z-face hemisphere in the static tetrad (e_r, e_theta, e_phi): at the
    # equator e_theta points along -z, so the vertical component is -a_n
    tile = lambda a: jnp.broadcast_to(a[None, :],           # noqa: E731
                                      (n_r, n_samples)).reshape(-1)
    d3 = jnp.stack([tile(a_r), -tile(a_n), tile(a_p)], axis=-1)
    p0 = ham.spawn_photon(metric, x0, d3)
    E = -p0[:, 0]                                 # nu_inf per sample

    far_r0 = None
    if far_accel:
        far_r0 = jnp.maximum(8.0 * metric.m, r_outer + 2.0 * metric.m)
    band = (r_inner, r_outer)
    if stepper == "rk45":
        from curvis_tpu.ops.march_pallas import march_kerr_rk45_pallas
        x, p, sign, _, (h1, h2) = march_kerr_rk45_pallas(
            metric, x0, p0, dt0=dt, max_steps=max_steps,
            escape_radius=escape_radius, rtol=rtol, atol=rtol * 1e-3,
            disk=band, interpret=(backend != "pallas") or interpret)
    elif backend == "pallas":
        from curvis_tpu.ops.march_pallas import march_kerr_pallas
        x, p, sign, _, (h1, h2) = march_kerr_pallas(
            metric, x0, p0, dt=dt, max_steps=max_steps,
            escape_radius=escape_radius, disk=band, far_r0=far_r0,
            interpret=interpret)
    else:
        x, p, sign, (h1, h2) = march_kerr_disk(
            metric, x0, p0, dt=dt, max_steps=max_steps,
            escape_radius=escape_radius, r_inner=r_inner, r_outer=r_outer,
            far_r0=far_r0)

    esc = (sign == 1)[:, None]
    xs = jnp.where(esc, x, x0)
    ps = jnp.where(esc, p, p0)
    wx, wy, wz = _asymptotic_dirs(metric, xs, ps)

    weight = jnp.where(sign == 1, 1.0, 0.0).astype(dtype)
    if boost:
        # bolometric Liouville boost (nu_loc / nu_inf)^4.  Samples spawn
        # with STATIC local energy 1, so nu_inf = E per sample.
        if boost == "orbit":
            # material-frame reception: the disk orbits at Omega =
            # sqrt(M) / (r^{3/2} + a sqrt(M)) with u^t = 1 / sqrt(1 - 3M/r
            # + 2 a sqrt(M) r^{-3/2}); nu_orbit = u^t (E - Omega L) —
            # per-sample L carries the frame-dragging AND orbital-Doppler
            # asymmetry of the incident sky (prograde-facing samples see
            # the headlighted sky).  The hemisphere geometry stays the
            # static frame's (aberration of the sample set is the
            # remaining second-order refinement).
            M, aspin = metric.m, getattr(metric, "a", 0.0)
            sqM = jnp.sqrt(M)
            r32 = r0 * jnp.sqrt(r0)
            omega = sqM / (r32 + aspin * sqM)
            under = jnp.clip(1.0 - 3.0 * M / r0
                             + 2.0 * aspin * sqM / r32, 1e-3, None)
            u_t = 1.0 / jnp.sqrt(under)
            L = p0[:, 3]
            nu_loc = u_t * (E - omega * L)
        else:                                   # "static" (a->0 == planar)
            nu_loc = jnp.ones_like(E)
        ratio = nu_loc / jnp.maximum(E, 1e-12)
        if boost == "orbit":
            # near/inside the photon orbit u^t diverges (no timelike
            # circular orbit); clamp the shift like the emission shader
            # clamps g (render/kerr._kerr_circular_g clips at 4) so the
            # bolometric ^4 stays render-sane
            ratio = jnp.clip(ratio, 0.2, 4.0)
        r2 = ratio * ratio
        weight = weight * r2 * r2
    if shadow_params is not None:
        from curvis_tpu.render.disk import _emission_rgb
        g1 = jnp.ones_like(h1[0])
        _, alpha1 = _emission_rgb(h1[0], g1, shadow_params, dtype)
        _, alpha2 = _emission_rgb(h2[0], g1, shadow_params, dtype)
        weight = weight * (1.0 - alpha1) * (1.0 - alpha2)

    wx = wx.reshape(n_r, n_samples)
    wy = wy.reshape(n_r, n_samples)
    wz = wz.reshape(n_r, n_samples)
    weight = weight.reshape(n_r, n_samples)

    # axisymmetry expansion: azimuth j rotates (wx, wy) by phi_j about z;
    # the -z face (index 1) is the equatorial reflection wz -> -wz
    pp = (2.0 * jnp.pi / n_phi) * jnp.arange(n_phi, dtype=dtype)
    cj = jnp.cos(pp)[None, :, None]               # (1, n_phi, 1)
    sj = jnp.sin(pp)[None, :, None]
    wxi = wx[:, None, :]                          # (n_r, 1, K)
    wyi = wy[:, None, :]
    wzi = jnp.broadcast_to(wz[:, None, :], (n_r, n_phi, n_samples))
    rx = wxi * cj - wyi * sj                      # (n_r, n_phi, K)
    ry = wxi * sj + wyi * cj
    shape = (2, n_r, n_phi, n_samples)
    wxa = jnp.broadcast_to(rx[None], shape)
    wya = jnp.broadcast_to(ry[None], shape)
    sides = jnp.asarray([1.0, -1.0], dtype)[:, None, None, None]
    wza = jnp.broadcast_to(wzi[None] * sides, shape)
    flat = (-1,)
    L = _shade_soa(bg, wxa.reshape(flat), wya.reshape(flat),
                   wza.reshape(flat), sample_filtering).reshape(shape + (3,))
    L = L * weight[None, :, None, :, None]
    return StarlightMap(radii=rr, values=jnp.mean(L, axis=3))


_kerr_map_jit = jax.jit(
    lambda *a, **k: _kerr_map_impl(*a, **k),
    static_argnames=("max_steps", "n_r", "n_phi", "n_samples",
                     "sample_filtering", "backend", "stepper", "rtol",
                     "boost", "shadow_params", "far_accel", "interpret"))


def starlight_lookup(smap: StarlightMap, r_hit, phi_world, side):
    """Bilinear (r, phi) lookup with azimuthal wraparound; ``side`` in
    {+1, -1} selects the face.  ``r_hit`` may be SIGNED (planar marchers
    record sign = sheet): the radius is |r_hit| and, when the map carries
    a negative-sheet table, r_hit < 0 selects it.  Returns (N, 3)
    reflected-sky radiance E / pi (multiply by albedo for the Lambertian
    exitance)."""
    if smap.values_neg is not None:
        pos = starlight_lookup(smap._replace(values_neg=None),
                               jnp.abs(r_hit), phi_world, side)
        neg = starlight_lookup(
            StarlightMap(smap.radii, smap.values_neg), jnp.abs(r_hit),
            phi_world, side)
        return jnp.where((r_hit < 0.0)[:, None], neg, pos)
    vals = smap.values
    _, n_r, n_phi, _ = vals.shape
    r0 = smap.radii[0]
    r1 = smap.radii[-1]
    r_hit = jnp.abs(r_hit)
    tr = jnp.clip((r_hit - r0) / (r1 - r0), 0.0, 1.0) * (n_r - 1)
    i0 = jnp.clip(jnp.floor(tr).astype(jnp.int32), 0, n_r - 2)
    fr = (tr - i0)[:, None]
    tp = jnp.mod(phi_world / (2.0 * jnp.pi), 1.0) * n_phi
    j0 = jnp.clip(jnp.floor(tp).astype(jnp.int32), 0, n_phi - 1)
    fp = (tp - j0)[:, None]
    j1 = jnp.mod(j0 + 1, n_phi)
    s = ((1.0 - side) * 0.5).astype(jnp.int32)       # +1 -> 0, -1 -> 1
    rows = vals.reshape(-1, 3)
    base = (s * n_r + i0) * n_phi

    def gather(i_off, j):
        return rows[base + i_off * n_phi + j]

    top = gather(0, j0) * (1.0 - fp) + gather(0, j1) * fp
    bot = gather(1, j0) * (1.0 - fp) + gather(1, j1) * fp
    return top * (1.0 - fr) + bot * fr


def starlight_scatter_block(smap: StarlightMap, disk, dtype=jnp.float32):
    """The (SCATTER_BLOCK,) in-gas scattering coefficients for the
    volumetric kernels (ops/march_pallas module-top contract): [tint_rgb,
    then per channel the SCATTER_DEG-degree monomial fit of kappa_s *
    albedo_c * Ebar_c(t)], where Ebar is the face/azimuth-averaged map
    profile over t = 2 (r - r_in) / (r_out - r_in) - 1 and kappa_s =
    disk.starlight_scatter * disk.kappa (scattering strength as a fraction
    of the absorption coefficient).  The fit matrix is a static host-side
    pinv (the map's radial grid is static), so the block is differentiable
    in the map and in the disk knobs."""
    from curvis_tpu.ops.march_pallas import SCATTER_BLOCK, SCATTER_DEG
    prof = jnp.mean(smap.values, axis=(0, 2))          # (n_r, 3)
    if smap.values_neg is not None:
        prof = 0.5 * (prof + jnp.mean(smap.values_neg, axis=(0, 2)))
    n_r = prof.shape[0]
    t = np.linspace(-1.0, 1.0, n_r)
    pinv = np.linalg.pinv(np.vander(t, SCATTER_DEG + 1, increasing=True))
    coefs = jnp.asarray(pinv, dtype) @ prof.astype(dtype)   # (D+1, 3)
    albedo = jnp.asarray(disk.albedo, dtype)
    ks = jnp.asarray(disk.starlight_scatter * disk.kappa, dtype)
    coefs = coefs * albedo[None, :] * ks
    tint = jnp.asarray(disk.tint, dtype)
    block = jnp.concatenate([tint, coefs.T.reshape(-1)])
    assert block.shape == (SCATTER_BLOCK,)
    return block
