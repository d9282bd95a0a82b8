"""Kerr black-hole renderer: spinning shadows, frame-dragged disks.

Built on the autodiff-Hamiltonian marcher (physics/hamiltonian.py): per-pixel
photons spawn from a numerically-orthonormalized static tetrad, march the
full Boyer-Lindquist system (no symmetry reduction — Kerr has none to give),
terminate on escape or horizon capture, and shade from the background with
optional equatorial accretion-disk crossings.

High spin produces the classic signatures: the D-shaped shadow (prograde
photons graze far closer than retrograde) and the Doppler/frame-dragging
brightness asymmetry of the disk, with g-factor
    g = sqrt(1 - 3M/r + 2 s a sqrt(M) r^{-3/2}) / (1 - Omega_s b_photon),
    Omega_s = s sqrt(M) / (r^{3/2} + s a sqrt(M)),   b_photon = L/E
(per-ray constants L, E — beaming costs nothing in the march).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from curvis_tpu.camera.camera import Camera
from curvis_tpu.env.spherical_image import SphericalImage
from curvis_tpu.geometry.rotations import frame_matrix
from curvis_tpu.metrics.kerr import KerrMetric
from curvis_tpu.physics import hamiltonian as ham
from curvis_tpu.render.disk import DiskParams
from curvis_tpu.render.fast import _filter_lookup, _pixel_dirs_soa, _texture_uv


def march_kerr_disk(metric: KerrMetric, x0, p0, *, dt, max_steps,
                    escape_radius, r_inner, r_outer, axis_u0=0.01,
                    far_r0=None):
    """Masked RK4 march recording the first two equatorial-plane crossings
    (cos theta sign changes) with BL radius inside [r_inner, r_outer].
    Returns (x, p, sign, ((h1_r, h1_phi, h1_side), (h2_r, h2_phi,
    h2_side))) — azimuth and approach side (sign of cos theta just before
    the crossing) are the Kerr starlight-map lookup coordinates."""
    dt = jnp.asarray(dt, x0.dtype)
    if far_r0 is None:
        far_r0 = jnp.asarray(1e30, x0.dtype)
    cap = metric.capture_radius
    n = x0.shape[0]
    zeros = jnp.zeros((n,), x0.dtype)
    state0 = (x0, p0, jnp.zeros((n,), jnp.int32),
              (zeros,) * 6, jnp.cos(x0[:, 2]), jnp.int32(0))

    def cond(c):
        sign = c[2]
        it = c[-1]
        return (it < max_steps) & jnp.any(sign == 0)

    def body(c):
        x, p, sign, hits, ct_prev, it = c
        h1, h1f, h1d, h2, h2f, h2d = hits
        active = sign == 0
        r_prev = x[:, 1]
        ph_prev = x[:, 3]
        dte = dt * ham.axis_dt_scale(x[:, 2], axis_u0) \
            * ham.far_dt_scale(r_prev, far_r0)
        x1, p1 = ham.rk4_step_batched(metric, x, p, dte[:, None])
        am = active[:, None]
        x = jnp.where(am, x1, x)
        p = jnp.where(am, p1, p)
        ct = jnp.cos(x[:, 2])
        crossed = active & (ct_prev * ct < 0.0)
        frac = jnp.abs(ct_prev) / jnp.maximum(jnp.abs(ct_prev) + jnp.abs(ct),
                                              1e-30)
        # linear-in-step radius/azimuth at the crossing (same interpolation
        # as the pallas kernel, ops/march_pallas.py:_kerr_kernel)
        r_hit = r_prev + frac * (x[:, 1] - r_prev)
        ph_hit = ph_prev + frac * (x[:, 3] - ph_prev)
        side = jnp.where(ct_prev > 0.0, 1.0, -1.0)
        in_disk = crossed & (r_hit >= r_inner) & (r_hit <= r_outer)
        new2 = in_disk & (h1 != 0.0) & (h2 == 0.0)
        new1 = in_disk & (h1 == 0.0)
        h2 = jnp.where(new2, r_hit, h2)
        h2f = jnp.where(new2, ph_hit, h2f)
        h2d = jnp.where(new2, side, h2d)
        h1 = jnp.where(new1, r_hit, h1)
        h1f = jnp.where(new1, ph_hit, h1f)
        h1d = jnp.where(new1, side, h1d)
        r = x[:, 1]
        # full-state blowup guard, matches the pallas kernel's predicate
        m_chk = (jnp.abs(r) + jnp.abs(x[:, 2]) + jnp.abs(x[:, 3])
                 + jnp.abs(p[:, 1]) + jnp.abs(p[:, 2]))
        ok = m_chk <= 1e8
        sign = jnp.where(active & ok & (r > escape_radius), 1, sign)
        sign = jnp.where(active & ok & (r < cap), 2, sign)
        sign = jnp.where(active & ~ok, 3, sign)
        ct_prev = jnp.where(active, ct, ct_prev)
        return x, p, sign, (h1, h1f, h1d, h2, h2f, h2d), ct_prev, it + 1

    x, p, sign, hits, _, _ = lax.while_loop(cond, body, state0)
    return x, p, sign, (hits[:3], hits[3:])


def _kerr_circular_g(metric, rr, b_photon, spin_sign):
    """g-factor seen through a photon with impact parameter b = L/E from
    disk material on a prograde/retrograde circular equatorial orbit.  In
    the Kerr-Newman family (charge Q, = 0 for Kerr) with
    s = sqrt(M r - Q^2):
        Omega_s = s_spin s / (r^2 + s_spin a s)
        g = sqrt(1 - 3M/r + 2Q^2/r^2 + 2 s_spin a s / r^2) / (1 - Omega_s b)
    (reduces to the familiar sqrt(1 - 3M/r + 2 s_spin a sqrt(M) r^{-3/2})
    form at Q = 0).  Shared by the thin-crossing shader and the volumetric
    march; the Pallas kernel (_kerr_vol_emission) mirrors this exact
    algebraic form."""
    M, a = metric.m, metric.a
    q = getattr(metric, "q", None)
    q2 = q * q if q is not None else jnp.zeros_like(M)
    s = spin_sign
    sq = jnp.sqrt(jnp.maximum(M * rr - q2, 1e-12))
    rr2 = rr * rr
    omega = s * sq / (rr2 + s * a * sq)
    under = jnp.clip(1.0 - (3.0 * M - 2.0 * q2 / rr) / rr
                     + 2.0 * s * a * sq / rr2, 1e-3, None)
    return jnp.sqrt(under) / jnp.clip(1.0 - omega * b_photon, 0.2, 5.0)


def march_kerr_volumetric(metric: KerrMetric, x0, p0, *, dt, max_steps,
                          escape_radius, params: DiskParams, axis_u0=0.01,
                          far_r0=None, scatter_block=None):
    """Masked RK4 Kerr march with per-step volumetric radiative transfer
    through the flared Gaussian disk (render/disk.py:march_planar_disk_
    volumetric semantics, in Boyer-Lindquist: the vertical direction cosine
    is simply zq = cos(theta), and r_cyl = r sin(theta)).

    Per affine step ds (the axis-scaled masked dt): dtau = kappa rho ds and
    emission dI = e^{-tau} w(r_cyl, g) rho ds, with g the circular-orbit
    factor above evaluated per step — the volumetric disk inherits the full
    frame-dragging Doppler asymmetry.  Blown-up rays (sign 3 predicate)
    contribute nothing: the increments are select-gated on the finiteness
    check BEFORE accumulation, so a NaN state never poisons tau/em (0 * NaN
    is NaN — a multiplicative mask is not enough).

    Returns (x, p, sign, tau, (em_r, em_g, em_b))."""
    from curvis_tpu.render.disk import (OPAQUE_SIGN, blackbody_rgb,
                                        disk_temperature)
    dtype = x0.dtype
    dt = jnp.asarray(dt, dtype)
    if far_r0 is None:
        far_r0 = jnp.asarray(1e30, dtype)
    cap = metric.capture_radius
    n = x0.shape[0]
    blackbody = params.color_mode == "blackbody"
    h2 = params.h_rel * params.h_rel
    inv_norm = float(1.0 / (np.sqrt(2.0 * np.pi) * params.h_rel))
    w_edge = params.r_outer - params.r_inner
    b_photon = p0[:, 3] / (-p0[:, 0])
    beaming = params.redshift or params.doppler

    def step_emission(r, th, tau):
        zq2 = jnp.cos(th) ** 2
        s2 = jnp.clip(1.0 - zq2, 1e-12, 1.0)
        r_cyl = r * jnp.sqrt(s2)
        dens = jnp.exp(-zq2 / (2.0 * h2 * s2)) * (inv_norm / r_cyl)
        edge_in = jnp.clip((r_cyl - params.r_inner) / (0.1 * w_edge), 0., 1.)
        edge_out = jnp.clip((params.r_outer - r_cyl) / (0.3 * w_edge), 0., 1.)
        base = dens * edge_in * edge_out
        rr = jnp.maximum(r_cyl, params.r_inner)
        g = _kerr_circular_g(metric, rr, b_photon, params.spin_sign) \
            if beaming else jnp.ones_like(r_cyl)
        trans = jnp.exp(-tau)
        dtau = params.kappa * base
        scat = None
        if scatter_block is not None:
            # in-gas starlight source (ops/march_pallas._kerr_vol_emission
            # twin): Horner per channel in the compactified radius
            from curvis_tpu.ops.march_pallas import SCATTER_DEG
            t = jnp.clip(2.0 * (r_cyl - params.r_inner) / w_edge - 1.0,
                         -1.0, 1.0)
            sw = trans * base
            scat = []
            for c in range(3):
                c0 = 3 + c * (SCATTER_DEG + 1)
                acc = scatter_block[c0 + SCATTER_DEG]
                for k in range(SCATTER_DEG - 1, -1, -1):
                    acc = acc * t + scatter_block[c0 + k]
                scat.append(sw * jnp.maximum(acc, 0.0))
        if blackbody:
            t_obs = g * disk_temperature(rr, params)
            rel = (t_obs / params.t_peak) ** 4
            chroma = blackbody_rgb(t_obs)
            w = trans * base * rel
            out = [w * chroma[..., 0], w * chroma[..., 1],
                   w * chroma[..., 2]]
            if scat is not None:
                out = [o + sc for o, sc in zip(out, scat)]
            return dtau, out[0], out[1], out[2]
        emis = (params.r_inner / rr) ** params.emissivity_index
        w = trans * base * emis * jnp.clip(g, 0.0, 4.0) ** 3
        if scat is not None:
            # colored scattering: fold the tint in here (the shader skips
            # its grayscale tint scaling — the kernels' scatter contract)
            return (dtau, w * scatter_block[0] + scat[0],
                    w * scatter_block[1] + scat[1],
                    w * scatter_block[2] + scat[2])
        return dtau, w, w, w

    zeros = jnp.zeros((n,), dtype)
    state0 = (x0, p0, jnp.zeros((n,), jnp.int32), zeros, zeros, zeros, zeros,
              jnp.int32(0))

    def cond(c):
        return (c[-1] < max_steps) & jnp.any(c[2] == 0)

    def body(c):
        x, p, sign, tau, emr, emg, emb, it = c
        active = sign == 0
        dte = dt * ham.axis_dt_scale(x[:, 2], axis_u0) \
            * ham.far_dt_scale(x[:, 1], far_r0)
        x1, p1 = ham.rk4_step_batched(metric, x, p, dte[:, None])
        am = active[:, None]
        x = jnp.where(am, x1, x)
        p = jnp.where(am, p1, p)
        r = x[:, 1]
        m_chk = (jnp.abs(r) + jnp.abs(x[:, 2]) + jnp.abs(x[:, 3])
                 + jnp.abs(p[:, 1]) + jnp.abs(p[:, 2]))
        ok = m_chk <= 1e8
        dtau, dr_, dg_, db_ = step_emission(r, x[:, 2], tau)
        gate = active & ok
        emr = emr + jnp.where(gate, dte * dr_, 0.0)
        emg = emg + jnp.where(gate, dte * dg_, 0.0)
        emb = emb + jnp.where(gate, dte * db_, 0.0)
        tau = tau + jnp.where(gate, dte * dtau, 0.0)
        sign = jnp.where(active & ok & (r > escape_radius), 1, sign)
        sign = jnp.where(active & ok & (r < cap), 2, sign)
        sign = jnp.where(active & ~ok, 3, sign)
        sign = jnp.where((sign == 0) & (tau > params.tau_max), OPAQUE_SIGN,
                         sign)
        return x, p, sign, tau, emr, emg, emb, it + 1

    x, p, sign, tau, emr, emg, emb, _ = lax.while_loop(cond, body, state0)
    return x, p, sign, tau, (emr, emg, emb)


def _kerr_disk_rgb(metric: KerrMetric, r_hit, b_photon, params: DiskParams,
                   dtype, starlight=None):
    """Disk emission with the Kerr circular-orbit g-factor (color/alpha
    assembly shared with the planar shader, render/disk._emission_rgb —
    incl. the blackbody chromatic-shift mode and the reflected-starlight
    term)."""
    from curvis_tpu.render.disk import _emission_rgb
    rr = jnp.maximum(r_hit, params.r_inner)
    g = _kerr_circular_g(metric, rr, b_photon, params.spin_sign) \
        if (params.doppler or params.redshift) else jnp.ones_like(r_hit)
    return _emission_rgb(r_hit, g, params, dtype, starlight=starlight)


def render_kerr(metric: KerrMetric, camera: Camera, bg: SphericalImage, *,
                dt=0.1, max_steps=20_000, escape_radius=None,
                disk: DiskParams | None = None, filtering="bilinear",
                backend="auto", camera_velocity=None, far_accel=True,
                stepper="rk4", rtol=1e-4, disk_theta=None,
                starlight_map=None):
    """(H, W, 3): Kerr shadow + lensed background (+ optional disk).

    Camera position is (t, r, theta, phi) in Boyer-Lindquist; pixel rays are
    decomposed in the asymptotic frame convention [r_hat, theta_hat, phi_hat]
    at the camera angles (exact as r -> infinity).

    ``backend='auto'`` marches with the hand-inlined Pallas Kerr kernel on
    TPU (ops/march_pallas.py:march_kerr_pallas — same flow as the autodiff
    marcher, VMEM-resident) and the XLA autodiff marcher elsewhere.  Eager
    calls self-jit (one cached compiled bundle per config).

    ``stepper='rk45'`` switches the bare-shadow and thin-disk marches to
    the error-controlled Dormand-Prince pair (per-ray adaptive dt bounded
    by ``rtol``; ``dt`` becomes the initial step) — typically several times
    faster than fixed RK4 at equal accuracy; volumetric disks keep RK4
    (their quality bound is the transfer quadrature, not the ODE error).
    """
    if backend == "auto":
        from curvis_tpu.integrate.march import _on_tpu
        backend = "pallas" if _on_tpu() else "xla"
    if camera_velocity is not None:
        camera_velocity = jnp.asarray(camera_velocity,
                                      camera.position.dtype)
    return _render_kerr_jit(metric, camera, bg, jnp.asarray(dt),
                            max_steps=max_steps, escape_radius=escape_radius,
                            disk=disk, filtering=filtering, backend=backend,
                            camera_velocity=camera_velocity,
                            far_accel=far_accel, stepper=stepper, rtol=rtol,
                            disk_theta=disk_theta,
                            starlight_map=starlight_map)


_render_kerr_jit = jax.jit(
    lambda *a, **k: _render_kerr_impl(*a, **k),
    static_argnames=("max_steps", "escape_radius", "disk", "filtering",
                     "backend", "far_accel", "stepper", "rtol"))


def _spawn_kerr_rays(metric, camera, velocity=None):
    """Per-pixel BL state bundle for one camera: (N, 4) x0, (N, 4) covariant
    p0 via the asymptotic-frame pixel decomposition + static tetrad.

    ``velocity`` (world-frame 3-velocity beta of the camera relative to the
    local static observer, |beta| < 1) applies special-relativistic
    aberration to the pixel directions before the spawn — the DNGR
    moving-camera physics — and switches the return to
    (x0, p0, delta) with delta the per-ray received-frequency Doppler
    factor (camera/camera.py:aberrate_directions)."""
    pos = camera.position
    dx_, dy_, dz_ = _pixel_dirs_soa(camera, False)
    delta = None
    if velocity is not None:
        from curvis_tpu.camera.camera import aberrate_directions
        dx_, dy_, dz_, delta = aberrate_directions(dx_, dy_, dz_, velocity)
    x0, p0 = _spawn_from_dirs(metric, pos, dx_, dy_, dz_)
    if velocity is not None:
        return x0, p0, delta
    return x0, p0


def _spawn_from_dirs(metric, pos, dx_, dy_, dz_):
    """BL state bundle for explicit world-frame look directions at ``pos``
    — the shared tail of the pixel spawn, also aimed at sub-pixel
    directions by the adaptive supersampler."""
    d_world = jnp.stack([dx_, dy_, dz_], axis=-1)
    F = frame_matrix(pos[2], pos[3])
    comps = d_world @ F                               # (N, 3) tetrad comps
    n = comps.shape[0]
    x0 = jnp.broadcast_to(pos, (n, 4))
    p0 = ham.spawn_photon(metric, x0, comps)
    return x0, p0


def _render_kerr_impl(metric, camera, bg, dt, *, max_steps, escape_radius,
                      disk, filtering, backend, camera_velocity=None,
                      far_accel=True, stepper="rk4", rtol=1e-4,
                      disk_theta=None, starlight_map=None):
    pos = camera.position
    if escape_radius is None:
        escape_radius = 2.0 * pos[1]          # traced-safe
    if camera_velocity is None:
        x0, p0 = _spawn_kerr_rays(metric, camera)
        delta = None
    else:
        x0, p0, delta = _spawn_kerr_rays(metric, camera, camera_velocity)
    colors = _kerr_march_and_shade(metric, x0, p0, bg, dt,
                                   max_steps=max_steps,
                                   escape_radius=escape_radius, disk=disk,
                                   filtering=filtering, backend=backend,
                                   far_accel=far_accel, stepper=stepper,
                                   rtol=rtol, disk_theta=disk_theta,
                                   starlight_map=starlight_map)
    if delta is not None:
        # received surface brightness ~ delta^3 (I_nu/nu^3 invariance);
        # applied to the whole received field (background + disk emission)
        colors = jnp.clip(colors * (delta ** 3)[:, None], 0.0, 1.0)
    W, H = camera.resolution_x, camera.resolution_y
    return colors.reshape(W, H, 3).transpose(1, 0, 2)


def _kerr_march_and_shade(metric, x0, p0, bg, dt, *, max_steps,
                          escape_radius, disk, filtering, backend,
                          far_accel=True, stepper="rk4", rtol=1e-4,
                          disk_theta=None, starlight_map=None):
    """March an (N,)-ray BL bundle and shade it -> (N, 3) colors.  Shared by
    the single-frame and frames-batched Kerr renderers (all per-ray math, so
    batching frames is pure concatenation).

    ``far_accel`` grows dt linearly with r beyond max(8M, r_out + 2M)
    (ham.far_dt_scale, capped 8x): ~2x fewer lock-step iterations at
    sub-texel escape-direction error; the threshold clears the disk so gas
    quadrature and crossing interpolation keep their base resolution."""
    far_r0 = None
    if far_accel:
        far_r0 = 8.0 * metric.m
        if disk is not None:
            far_r0 = jnp.maximum(far_r0, disk.r_outer + 2.0 * metric.m)
    vol = disk is not None and disk.volumetric
    scatter_block = None
    if vol and disk.starlight:
        # in-gas single scattering of the lensed sky (round 5, the BL twin
        # of the planar scatter source): the Kerr starlight map's radial
        # profile rides the kernels' SMEM row at KERR_SCATTER_OFF
        if starlight_map is None:
            raise ValueError(
                "disk.starlight=True with volumetric=True for Kerr needs a "
                "precomputed starlight_map=compute_kerr_starlight_map(...) "
                "(camera-independent; the in-gas scattering source is "
                "built from its radial profile)")
        from curvis_tpu.render.disk import disk_view
        from curvis_tpu.render.starlight import starlight_scatter_block
        scatter_block = starlight_scatter_block(
            starlight_map, disk_view(disk, disk_theta), x0.dtype)
    if stepper == "rk45":
        # error-controlled march (bare shadow / thin disk / volumetric
        # gas): the Pallas DP pair on TPU, its XLA twin elsewhere
        # (interpret kernel for the disk-tracking and volumetric variants,
        # which only the kernel implements).  Differentiable backends run
        # the rk45 adjoints: exact gradients through the adaptive march
        # with the per-ray iteration sequence replayed as data — 'scan' =
        # XLA pair, 'adjoint' = Pallas forward + Pallas checkpointed-
        # recompute backward on TPU.  Disk and volumetric surfaces are
        # differentiable too (integrate/kerr_surface_adjoint.py, round 5):
        # crossing records and radiative-transfer accumulators ride the
        # replayed state, and traced disk parameters flow via
        # ``disk_theta``.  NB the replay cost scales with max_iters =
        # 2*max_steps, so differentiable rk45 callers should pass
        # rk45-scale max_steps (~hundreds), not the fixed-step tens of
        # thousands.
        if backend in ("scan", "adjoint"):
            mback = "xla" if backend == "scan" else "auto"
            kwa = dict(dt0=dt, max_steps=max_steps,
                       escape_radius=escape_radius, rtol=rtol,
                       atol=rtol * 1e-3, backend=mback)
            if vol:
                from curvis_tpu.integrate.kerr_surface_adjoint import (
                    march_kerr_rk45_vol_adjoint)
                x, p, sign, _, tau, em = march_kerr_rk45_vol_adjoint(
                    metric, x0, p0, disk, disk_theta=disk_theta,
                    scatter_block=scatter_block, **kwa)
                return _kerr_shade(metric, x0, p0, bg, x, p, sign, disk,
                                   filtering, True, tau, em, None, None,
                                   disk_theta,
                                   scatter=scatter_block is not None)
            if disk is not None:
                from curvis_tpu.integrate.kerr_surface_adjoint import (
                    march_kerr_rk45_disk_adjoint)
                x, p, sign, _, (h1, h2) = march_kerr_rk45_disk_adjoint(
                    metric, x0, p0, r_inner=disk.r_inner,
                    r_outer=disk.r_outer, **kwa)
                return _kerr_shade(metric, x0, p0, bg, x, p, sign, disk,
                                   filtering, False, None, None, h1, h2,
                                   disk_theta, starlight_map)
            from curvis_tpu.integrate.rk45_adjoint import (
                march_kerr_rk45_adjoint)
            x, p, sign, _ = march_kerr_rk45_adjoint(
                metric, x0, p0, dt0=dt, max_steps=max_steps,
                escape_radius=escape_radius, rtol=rtol, atol=rtol * 1e-3,
                backend=mback)
            return _kerr_shade(metric, x0, p0, bg, x, p, sign, disk,
                               filtering, False, None, None, None, None)
        from curvis_tpu.integrate.march import _on_tpu
        kw45 = dict(dt0=dt, max_steps=max_steps, escape_radius=escape_radius,
                    rtol=rtol, atol=rtol * 1e-3)
        if vol:
            from curvis_tpu.ops.march_pallas import march_kerr_rk45_pallas
            x, p, sign, _, (tau, em) = march_kerr_rk45_pallas(
                metric, x0, p0, vol_disk=disk,
                scatter_block=scatter_block, interpret=not _on_tpu(),
                **kw45)
            return _kerr_shade(metric, x0, p0, bg, x, p, sign, disk,
                               filtering, vol, tau, em, None, None,
                               scatter=scatter_block is not None)
        if disk is not None:
            from curvis_tpu.ops.march_pallas import march_kerr_rk45_pallas
            x, p, sign, _, (h1, h2) = march_kerr_rk45_pallas(
                metric, x0, p0, disk=(disk.r_inner, disk.r_outer),
                interpret=not _on_tpu(), **kw45)
        else:
            if backend == "pallas":
                from curvis_tpu.ops.march_pallas import march_kerr_rk45_pallas
                x, p, sign, _ = march_kerr_rk45_pallas(metric, x0, p0, **kw45)
            else:
                from curvis_tpu.integrate.rk45 import march_kerr_rk45
                res = march_kerr_rk45(metric, x0, p0,
                                      capture_radius=metric.capture_radius,
                                      **kw45)
                x, p, sign = res.x, res.p, res.sign
            h1 = h2 = None
        tau = em = None
        return _kerr_shade(metric, x0, p0, bg, x, p, sign, disk, filtering,
                           vol, tau, em, h1, h2, disk_theta, starlight_map)
    if vol:
        if backend in ("scan", "adjoint") or (disk_theta and
                                              backend != "pallas"):
            # differentiable volumetric march (round 5): radiative-transfer
            # accumulators ride the replayed state; traced disk params via
            # disk_theta.  Plain-xla + disk_theta routes here too (the
            # adjoint's forward IS the xla forward; the while-loop twin
            # below builds its emission row with host floats).
            from curvis_tpu.integrate.kerr_surface_adjoint import (
                march_kerr_vol_adjoint)
            x, p, sign, _, tau, em = march_kerr_vol_adjoint(
                metric, x0, p0, disk, disk_theta=disk_theta,
                scatter_block=scatter_block, dt=dt,
                max_steps=max_steps, escape_radius=escape_radius,
                far_r0=far_r0,
                backend=("auto" if backend == "adjoint" else "xla"))
        elif backend == "pallas":
            from curvis_tpu.ops.march_pallas import march_kerr_pallas
            vol_row = None
            if disk_theta:
                from curvis_tpu.integrate.kerr_surface_adjoint import (
                    build_vol_row)
                vol_row = build_vol_row(disk, disk_theta, x0.dtype)
            x, p, sign, _, (tau, em) = march_kerr_pallas(
                metric, x0, p0, dt=dt, max_steps=max_steps,
                escape_radius=escape_radius, vol_disk=disk,
                vol_row=vol_row, scatter_block=scatter_block,
                far_r0=far_r0)
        else:
            x, p, sign, tau, em = march_kerr_volumetric(
                metric, x0, p0, dt=dt, max_steps=max_steps,
                escape_radius=escape_radius, params=disk, far_r0=far_r0,
                scatter_block=scatter_block)
        h1 = h2 = None
    elif disk is not None:
        if backend in ("scan", "adjoint"):
            # differentiable thin-disk march (round 5): crossing records
            # ride the replayed state — captured rays' hits included
            from curvis_tpu.integrate.kerr_surface_adjoint import (
                march_kerr_disk_adjoint)
            x, p, sign, _, (h1, h2) = march_kerr_disk_adjoint(
                metric, x0, p0, r_inner=disk.r_inner, r_outer=disk.r_outer,
                dt=dt, max_steps=max_steps, escape_radius=escape_radius,
                far_r0=far_r0,
                backend=("auto" if backend == "adjoint" else "xla"))
        elif backend == "pallas":
            from curvis_tpu.ops.march_pallas import march_kerr_pallas
            x, p, sign, _, (h1, h2) = march_kerr_pallas(
                metric, x0, p0, dt=dt, max_steps=max_steps,
                escape_radius=escape_radius,
                disk=(disk.r_inner, disk.r_outer), far_r0=far_r0)
        else:
            x, p, sign, (h1, h2) = march_kerr_disk(
                metric, x0, p0, dt=dt, max_steps=max_steps,
                escape_radius=escape_radius, r_inner=disk.r_inner,
                r_outer=disk.r_outer, far_r0=far_r0)
    else:
        if backend == "pallas":
            from curvis_tpu.ops.march_pallas import march_kerr_pallas
            x, p, sign, _ = march_kerr_pallas(
                metric, x0, p0, dt=dt, max_steps=max_steps,
                escape_radius=escape_radius, far_r0=far_r0)
        elif backend == "scan":
            # reverse-differentiable march: grad(image) w.r.t. (m, a, q),
            # camera pose — the spin-recovery inverse problem.  Exact
            # discrete gradients, O(sqrt(steps)) remat memory, always runs
            # max_steps trips; prefer backend='adjoint' for speed.
            res = ham.march_hamiltonian_scan(
                metric, x0, p0, dt=dt, max_steps=max_steps,
                escape_radius=escape_radius,
                capture_radius=metric.capture_radius, far_r0=far_r0)
            x, p, sign = res.x, res.p, res.sign
        elif backend == "adjoint":
            # Pallas-speed differentiable march: Pallas forward (on TPU) +
            # checkpointed-recompute backward (integrate/kerr_adjoint.py) —
            # the production inverse-problem path; exact discrete gradients
            # (matches backend='scan' to machine precision)
            from curvis_tpu.integrate.kerr_adjoint import march_kerr_adjoint
            x, p, sign, _ = march_kerr_adjoint(
                metric, x0, p0, dt=dt, max_steps=max_steps,
                escape_radius=escape_radius, far_r0=far_r0)
        else:
            res = ham.march_hamiltonian(metric, x0, p0, dt=dt,
                                        max_steps=max_steps,
                                        escape_radius=escape_radius,
                                        capture_radius=metric.capture_radius,
                                        far_r0=far_r0)
            x, p, sign = res.x, res.p, res.sign
        h1 = h2 = None
    if not vol:
        tau = em = None
    return _kerr_shade(metric, x0, p0, bg, x, p, sign, disk, filtering,
                       vol, tau, em, h1, h2, disk_theta, starlight_map,
                       scatter=scatter_block is not None)


def _asymptotic_dirs(metric, x, p):
    """World-frame escape direction of a BL state bundle -> (wx, wy, wz):
    contravariant momentum decomposed in the asymptotic frame convention
    [r_hat, theta_hat, phi_hat] at the exit angles (exact as r -> inf).
    Shared by the shading readout and the Kerr starlight map."""
    ginv = metric.inverse_metric(x)
    pup = jnp.einsum("nij,nj->ni", ginv, p)
    r = x[:, 1]
    st = jnp.maximum(jnp.sin(x[:, 2]), 1e-6)
    u = jnp.stack([pup[:, 1], pup[:, 2] * r, pup[:, 3] * r * st], axis=-1)
    u = u / jnp.linalg.norm(u, axis=-1, keepdims=True)
    Fe = frame_matrix(x[:, 2], x[:, 3])               # (N, 3, 3)
    w = jnp.einsum("nij,nj->ni", Fe, u)
    return w[:, 0], w[:, 1], w[:, 2]


def _kerr_shade(metric, x0, p0, bg, x, p, sign, disk, filtering, vol,
                tau, em, h1, h2, disk_theta=None, starlight_map=None,
                scatter=False):
    """Shared shading tail of every Kerr march variant -> (N, 3) colors.

    Readout: asymptotic direction from contravariant momentum.  Only
    escaped rays are shaded from (x, p); captured/blown-up rays are
    masked to black below, so substitute their (possibly NaN) states with
    the spawn state first — output-neutral, but keeps reverse-mode
    gradients NaN-free (the select's zero cotangent still multiplies the
    branch's partials: 0 * NaN would poison d(image)/d(metric) in the
    backend='scan' inverse problems)."""
    esc = (sign == 1)[:, None]
    x = jnp.where(esc, x, x0)
    p = jnp.where(esc, p, p0)
    wx, wy, wz = _asymptotic_dirs(metric, x, p)

    uu, vv = _texture_uv(bg, wx, wy, wz)
    colors = _filter_lookup(bg.texture.reshape(-1, 3),
                            jnp.zeros_like(uu, jnp.int32), uu, vv,
                            bg.width, bg.height, filtering)
    colors = jnp.where((sign == 1)[:, None], colors, jnp.zeros_like(colors))

    from curvis_tpu.render.disk import disk_view
    shade = disk_view(disk, disk_theta) if disk is not None else disk
    if vol:
        from curvis_tpu.render.disk import _volumetric_rgb
        rgb, trans = _volumetric_rgb(tau, em, shade, x.dtype,
                                     scatter=scatter)
        colors = jnp.clip(rgb + trans[:, None] * colors, 0.0, 1.0)
    elif disk is not None:
        # h1/h2 are (radius, BL azimuth, approach side) crossing triples
        b_photon = -p0[:, 3] / p0[:, 0]               # L/E per ray (t-cov<0)
        star1 = star2 = None
        if disk.starlight:
            # lensed-sky illumination of the disk surface: the
            # axisymmetry-collapsed Kerr starlight map (render/starlight.
            # compute_kerr_starlight_map), looked up at the recorded
            # (radius, BL azimuth, approach side) of each crossing
            from curvis_tpu.render.starlight import starlight_lookup
            if starlight_map is None:
                raise ValueError(
                    "disk.starlight=True for Kerr needs a precomputed map: "
                    "pass starlight_map=compute_kerr_starlight_map(...) "
                    "(camera-independent — compute once per scene)")
            albedo = jnp.asarray(shade.albedo, x.dtype)[None, :]
            star1 = albedo * starlight_lookup(starlight_map, h1[0], h1[1],
                                              h1[2])
            star2 = albedo * starlight_lookup(starlight_map, h2[0], h2[1],
                                              h2[2])
        rgb1, a1 = _kerr_disk_rgb(metric, h1[0], b_photon, shade, x.dtype,
                                  starlight=star1)
        rgb2, a2 = _kerr_disk_rgb(metric, h2[0], b_photon, shade, x.dtype,
                                  starlight=star2)
        behind = rgb2 * a2[:, None] + colors * (1.0 - a2[:, None])
        colors = jnp.clip(rgb1 * a1[:, None] + behind * (1.0 - a1[:, None]),
                          0.0, 1.0)
    return colors


def render_kerr_frames_batched(metric: KerrMetric, cameras,
                               bg: SphericalImage, *, dt=0.1,
                               max_steps=20_000, escape_radius=None,
                               disk: DiskParams | None = None,
                               filtering="bilinear", backend="auto",
                               camera_velocities=None, far_accel=True,
                               stepper="rk4", rtol=1e-4, disk_theta=None,
                               starlight_map=None):
    """Render several Kerr camera poses in ONE device call -> (F, H, W, 3).

    Every stage of the Kerr pipeline (tetrad spawn, BL march, asymptotic
    readout, disk shading) is per-ray, so the frame axis batches by pure
    concatenation into one (F*N,) march bundle — one Pallas kernel launch
    (or one XLA while-loop) per batch instead of per frame, amortizing the
    fixed ~25 ms tunnel dispatch and filling the chip.  All cameras must
    share a resolution.  ``escape_radius=None`` uses 2 * max camera radius
    (one shared SMEM scalar for the whole batch)."""
    cams = list(cameras)
    W, H = cams[0].resolution_x, cams[0].resolution_y
    if any((c.resolution_x, c.resolution_y) != (W, H) for c in cams):
        raise ValueError("all cameras in a batch must share a resolution")
    if backend == "auto":
        from curvis_tpu.integrate.march import _on_tpu
        backend = "pallas" if _on_tpu() else "xla"
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *cams)
    if camera_velocities is not None:
        camera_velocities = jnp.asarray(camera_velocities,
                                        cams[0].position.dtype)
        if camera_velocities.shape != (len(cams), 3):
            raise ValueError("camera_velocities must be (n_frames, 3)")
    return _render_kerr_frames_jit(
        metric, stacked, bg, jnp.asarray(dt, cams[0].position.dtype),
        n_frames=len(cams), max_steps=max_steps, escape_radius=escape_radius,
        disk=disk, filtering=filtering, backend=backend,
        camera_velocities=camera_velocities, far_accel=far_accel,
        stepper=stepper, rtol=rtol, disk_theta=disk_theta,
        starlight_map=starlight_map)


_render_kerr_frames_jit = jax.jit(
    lambda *a, **k: _render_kerr_frames_impl(*a, **k),
    static_argnames=("n_frames", "max_steps", "escape_radius", "disk",
                     "filtering", "backend", "far_accel", "stepper", "rtol"))


def _render_kerr_frames_impl(metric, cams, bg, dt, *, n_frames, max_steps,
                             escape_radius, disk, filtering, backend,
                             camera_velocities=None, far_accel=True,
                             stepper="rk4", rtol=1e-4, disk_theta=None,
                             starlight_map=None):
    F = int(n_frames)
    if escape_radius is None:
        escape_radius = 2.0 * jnp.max(cams.position[:, 1])     # traced-safe
    vels = ([None] * F if camera_velocities is None
            else [camera_velocities[f] for f in range(F)])
    bundles = [_spawn_kerr_rays(metric,
                                jax.tree_util.tree_map(lambda a: a[f], cams),
                                vels[f])
               for f in range(F)]
    x0 = jnp.concatenate([b[0] for b in bundles])
    p0 = jnp.concatenate([b[1] for b in bundles])
    colors = _kerr_march_and_shade(metric, x0, p0, bg, dt,
                                   max_steps=max_steps,
                                   escape_radius=escape_radius, disk=disk,
                                   filtering=filtering, backend=backend,
                                   far_accel=far_accel, stepper=stepper,
                                   rtol=rtol, disk_theta=disk_theta,
                                   starlight_map=starlight_map)
    if camera_velocities is not None:
        delta = jnp.concatenate([b[2] for b in bundles])
        colors = jnp.clip(colors * (delta ** 3)[:, None], 0.0, 1.0)
    W, H = cams.resolution_x, cams.resolution_y    # static meta fields
    return colors.reshape(F, W, H, 3).transpose(0, 2, 1, 3)


def render_kerr_adaptive(metric: KerrMetric, camera: Camera,
                         bg: SphericalImage, *, dt=0.1, max_steps=20_000,
                         escape_radius=None, disk: DiskParams | None = None,
                         filtering="bilinear", backend="auto",
                         refine_frac=0.1, supersample=3,
                         camera_velocity=None, far_accel=True,
                         stepper="rk4", rtol=1e-4, disk_theta=None,
                         starlight_map=None):
    """Edge-adaptive antialiasing: base render + k x k supersampling of
    ONLY the ``refine_frac`` highest-contrast pixels, selected by the
    4-neighbor color gradient (lax.top_k — a static-shape second bundle,
    the TPU-native version of 'refine where it aliases').

    Shadow edges, photon rings and disk rims concentrate essentially all
    aliasing (the reference documents these pixel-boundary artifacts as a
    known limitation, README.md:108); full-frame supersampling pays k^2
    everywhere, this pays 1 + refine_frac * k^2 (~1.9x at the defaults)
    for the same visual result.  The refined pixels replace their corner
    sample with the mean of k x k centered sub-rays."""
    if backend == "auto":
        from curvis_tpu.integrate.march import _on_tpu
        backend = "pallas" if _on_tpu() else "xla"
    W, H = camera.resolution_x, camera.resolution_y
    n_refine = max(1, int(refine_frac * W * H))
    if camera_velocity is not None:
        camera_velocity = jnp.asarray(camera_velocity,
                                      camera.position.dtype)
    return _render_kerr_adaptive_jit(
        metric, camera, bg, jnp.asarray(dt), max_steps=max_steps,
        escape_radius=escape_radius, disk=disk, filtering=filtering,
        backend=backend, n_refine=n_refine, supersample=int(supersample),
        camera_velocity=camera_velocity, far_accel=far_accel,
        stepper=stepper, rtol=rtol, disk_theta=disk_theta,
        starlight_map=starlight_map)


_render_kerr_adaptive_jit = jax.jit(
    lambda *a, **k: _render_kerr_adaptive_impl(*a, **k),
    static_argnames=("max_steps", "escape_radius", "disk", "filtering",
                     "backend", "n_refine", "supersample", "far_accel",
                     "stepper", "rtol"))


def _render_kerr_adaptive_impl(metric, camera, bg, dt, *, max_steps,
                               escape_radius, disk, filtering, backend,
                               n_refine, supersample, camera_velocity,
                               far_accel=True, stepper="rk4", rtol=1e-4,
                               disk_theta=None, starlight_map=None):
    base = _render_kerr_impl(metric, camera, bg, dt, max_steps=max_steps,
                             escape_radius=escape_radius, disk=disk,
                             filtering=filtering, backend=backend,
                             camera_velocity=camera_velocity,
                             far_accel=far_accel, stepper=stepper,
                             rtol=rtol, disk_theta=disk_theta,
                             starlight_map=starlight_map)       # (H, W, 3)
    if escape_radius is None:
        escape_radius = 2.0 * camera.position[1]
    from curvis_tpu.render.fast import (_contrast_topk,
                                        _dirs_for_pixel_coords,
                                        _subpixel_coords)
    iy, ix = _contrast_topk(base, n_refine)
    k = supersample
    px, py = _subpixel_coords(iy, ix, k, n_refine, base.dtype)
    dxs, dys, dzs = _dirs_for_pixel_coords(camera, px, py)
    delta = None
    if camera_velocity is not None:
        from curvis_tpu.camera.camera import aberrate_directions
        dxs, dys, dzs, delta = aberrate_directions(dxs, dys, dzs,
                                                   camera_velocity)
    x0, p0 = _spawn_from_dirs(metric, camera.position, dxs, dys, dzs)
    colors = _kerr_march_and_shade(metric, x0, p0, bg, dt,
                                   max_steps=max_steps,
                                   escape_radius=escape_radius, disk=disk,
                                   filtering=filtering, backend=backend,
                                   far_accel=far_accel, stepper=stepper,
                                   rtol=rtol, disk_theta=disk_theta,
                                   starlight_map=starlight_map)
    if delta is not None:
        colors = jnp.clip(colors * (delta ** 3)[:, None], 0.0, 1.0)
    refined = colors.reshape(n_refine, k * k, 3).mean(axis=1)
    return base.at[iy, ix].set(refined)
