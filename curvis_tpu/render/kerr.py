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
from jax import lax

from curvis_tpu.camera.camera import Camera
from curvis_tpu.env.spherical_image import SphericalImage
from curvis_tpu.geometry.rotations import frame_matrix
from curvis_tpu.metrics.kerr import KerrMetric
from curvis_tpu.physics import hamiltonian as ham
from curvis_tpu.render.disk import DiskParams
from curvis_tpu.render.fast import _filter_lookup, _pixel_dirs_soa, _texture_uv


def march_kerr_disk(metric: KerrMetric, x0, p0, *, dt, max_steps,
                    escape_radius, r_inner, r_outer, axis_u0=0.01):
    """Masked RK4 march recording the first two equatorial-plane crossings
    (cos theta sign changes) with BL radius inside [r_inner, r_outer].
    Returns (x, p, sign, (h1_r, h2_r))."""
    dt = jnp.asarray(dt, x0.dtype)
    cap = metric.capture_radius
    n = x0.shape[0]
    zeros = jnp.zeros((n,), x0.dtype)
    state0 = (x0, p0, jnp.zeros((n,), jnp.int32), zeros, zeros,
              jnp.cos(x0[:, 2]), jnp.int32(0))

    def cond(c):
        sign = c[2]
        it = c[6]
        return (it < max_steps) & jnp.any(sign == 0)

    def body(c):
        x, p, sign, h1, h2, ct_prev, it = c
        active = sign == 0
        r_prev = x[:, 1]
        dte = dt * ham.axis_dt_scale(x[:, 2], axis_u0)
        x1, p1 = ham.rk4_step_batched(metric, x, p, dte[:, None])
        am = active[:, None]
        x = jnp.where(am, x1, x)
        p = jnp.where(am, p1, p)
        ct = jnp.cos(x[:, 2])
        crossed = active & (ct_prev * ct < 0.0)
        frac = jnp.abs(ct_prev) / jnp.maximum(jnp.abs(ct_prev) + jnp.abs(ct),
                                              1e-30)
        # linear-in-step radius at the crossing (same interpolation as the
        # pallas kernel, ops/march_pallas.py:_kerr_kernel)
        r_hit = r_prev + frac * (x[:, 1] - r_prev)
        in_disk = crossed & (r_hit >= r_inner) & (r_hit <= r_outer)
        h2 = jnp.where(in_disk & (h1 != 0.0) & (h2 == 0.0), r_hit, h2)
        h1 = jnp.where(in_disk & (h1 == 0.0), r_hit, h1)
        r = x[:, 1]
        # full-state blowup guard, matches the pallas kernel's predicate
        m_chk = (jnp.abs(r) + jnp.abs(x[:, 2]) + jnp.abs(x[:, 3])
                 + jnp.abs(p[:, 1]) + jnp.abs(p[:, 2]))
        ok = m_chk <= 1e8
        sign = jnp.where(active & ok & (r > escape_radius), 1, sign)
        sign = jnp.where(active & ok & (r < cap), 2, sign)
        sign = jnp.where(active & ~ok, 3, sign)
        ct_prev = jnp.where(active, ct, ct_prev)
        return x, p, sign, h1, h2, ct_prev, it + 1

    x, p, sign, h1, h2, _, _ = lax.while_loop(cond, body, state0)
    return x, p, sign, (h1, h2)


def _kerr_disk_rgb(metric: KerrMetric, r_hit, b_photon, params: DiskParams,
                   dtype):
    """Disk emission with the Kerr circular-orbit g-factor (color/alpha
    assembly shared with the planar shader, render/disk._emission_rgb —
    incl. the blackbody chromatic-shift mode)."""
    from curvis_tpu.render.disk import _emission_rgb
    rr = jnp.maximum(r_hit, params.r_inner)
    g = jnp.ones_like(r_hit)
    if params.doppler or params.redshift:
        M, a = metric.m, metric.a
        s = params.spin_sign
        sqM = jnp.sqrt(M)
        omega = s * sqM / (rr ** 1.5 + s * a * sqM)
        under = jnp.clip(1.0 - 3.0 * M / rr + 2.0 * s * a * sqM * rr ** -1.5,
                         1e-3, None)
        g = jnp.sqrt(under) / jnp.clip(1.0 - omega * b_photon, 0.2, 5.0)
    return _emission_rgb(r_hit, g, params, dtype)


def render_kerr(metric: KerrMetric, camera: Camera, bg: SphericalImage, *,
                dt=0.1, max_steps=20_000, escape_radius=None,
                disk: DiskParams | None = None, filtering="bilinear",
                backend="auto"):
    """(H, W, 3): Kerr shadow + lensed background (+ optional disk).

    Camera position is (t, r, theta, phi) in Boyer-Lindquist; pixel rays are
    decomposed in the asymptotic frame convention [r_hat, theta_hat, phi_hat]
    at the camera angles (exact as r -> infinity).

    ``backend='auto'`` marches with the hand-inlined Pallas Kerr kernel on
    TPU (ops/march_pallas.py:march_kerr_pallas — same flow as the autodiff
    marcher, VMEM-resident) and the XLA autodiff marcher elsewhere.  Eager
    calls self-jit (one cached compiled bundle per config).
    """
    if backend == "auto":
        from curvis_tpu.integrate.march import _on_tpu
        backend = "pallas" if _on_tpu() else "xla"
    return _render_kerr_jit(metric, camera, bg, jnp.asarray(dt),
                            max_steps=max_steps, escape_radius=escape_radius,
                            disk=disk, filtering=filtering, backend=backend)


_render_kerr_jit = jax.jit(
    lambda *a, **k: _render_kerr_impl(*a, **k),
    static_argnames=("max_steps", "escape_radius", "disk", "filtering",
                     "backend"))


def _render_kerr_impl(metric, camera, bg, dt, *, max_steps, escape_radius,
                      disk, filtering, backend):
    pos = camera.position
    if escape_radius is None:
        escape_radius = 2.0 * pos[1]          # traced-safe
    dx_, dy_, dz_ = _pixel_dirs_soa(camera, False)
    d_world = jnp.stack([dx_, dy_, dz_], axis=-1)
    F = frame_matrix(pos[2], pos[3])
    comps = d_world @ F                               # (N, 3) tetrad comps
    n = comps.shape[0]
    x0 = jnp.broadcast_to(pos, (n, 4))
    p0 = ham.spawn_photon(metric, x0, comps)

    if disk is not None:
        if backend == "pallas":
            from curvis_tpu.ops.march_pallas import march_kerr_pallas
            x, p, sign, _, (h1, h2) = march_kerr_pallas(
                metric, x0, p0, dt=dt, max_steps=max_steps,
                escape_radius=escape_radius,
                disk=(disk.r_inner, disk.r_outer))
        else:
            x, p, sign, (h1, h2) = march_kerr_disk(
                metric, x0, p0, dt=dt, max_steps=max_steps,
                escape_radius=escape_radius, r_inner=disk.r_inner,
                r_outer=disk.r_outer)
    else:
        if backend == "pallas":
            from curvis_tpu.ops.march_pallas import march_kerr_pallas
            x, p, sign, _ = march_kerr_pallas(
                metric, x0, p0, dt=dt, max_steps=max_steps,
                escape_radius=escape_radius)
        else:
            res = ham.march_hamiltonian(metric, x0, p0, dt=dt,
                                        max_steps=max_steps,
                                        escape_radius=escape_radius,
                                        capture_radius=metric.capture_radius)
            x, p, sign = res.x, res.p, res.sign
        h1 = h2 = None

    # readout: asymptotic direction from contravariant momentum
    ginv = metric.inverse_metric(x)
    pup = jnp.einsum("nij,nj->ni", ginv, p)
    r = x[:, 1]
    st = jnp.maximum(jnp.sin(x[:, 2]), 1e-6)
    u = jnp.stack([pup[:, 1], pup[:, 2] * r, pup[:, 3] * r * st], axis=-1)
    u = u / jnp.linalg.norm(u, axis=-1, keepdims=True)
    Fe = frame_matrix(x[:, 2], x[:, 3])               # (N, 3, 3)
    w = jnp.einsum("nij,nj->ni", Fe, u)
    wx, wy, wz = w[:, 0], w[:, 1], w[:, 2]

    uu, vv = _texture_uv(bg, wx, wy, wz)
    colors = _filter_lookup(bg.texture.reshape(-1, 3),
                            jnp.zeros_like(uu, jnp.int32), uu, vv,
                            bg.width, bg.height, filtering)
    colors = jnp.where((sign == 1)[:, None], colors, jnp.zeros_like(colors))

    if disk is not None:
        b_photon = -p0[:, 3] / p0[:, 0]               # L/E per ray (t-cov<0)
        rgb1, a1 = _kerr_disk_rgb(metric, h1, b_photon, disk, x.dtype)
        rgb2, a2 = _kerr_disk_rgb(metric, h2, b_photon, disk, x.dtype)
        behind = rgb2 * a2[:, None] + colors * (1.0 - a2[:, None])
        colors = jnp.clip(rgb1 * a1[:, None] + behind * (1.0 - a1[:, None]),
                          0.0, 1.0)
    W, H = camera.resolution_x, camera.resolution_y
    return colors.reshape(W, H, 3).transpose(1, 0, 2)
