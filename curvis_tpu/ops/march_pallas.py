"""Pallas TPU kernel for the planar ray march — the production hot loop.

The whole render cost lives in the geodesic step loop (SURVEY.md section 3.1:
the innermost hot loop is `update_relativistic_object`, metrics.rs:283-297).
This kernel runs the reduced planar system (physics/planar.py)

    dl = p_l;  dpsi = b / r^2;  dp_l = b^2 r'(l) / r^3

entirely in VMEM/vector registers: a 1-D grid of ray tiles, each program
looping with a `lax.while_loop` that exits as soon as *its* tile has fully
terminated.  Ray state never touches HBM between steps (vs the XLA
while-loop path, which streams the carry), and escape-check semantics are
exactly the reference's (masked per-step, post-step strict |l| > R test,
systems.rs:126-135), so results are bit-comparable with the scan/while
backends for the Euler stepper.  Kernels in this file:

  - ``_march_kernel``  : Euler parity march (maskless sprint + masked phase)
  - ``_rk45_kernel``   : adaptive Dormand-Prince with per-ray dt
  - ``_disk_kernel``   : Euler march + equatorial-crossing capture for
                         accretion-disk rendering
All support Ellis / DNEG / flat / Schwarzschild (capture via SMEM radius).

Runtime parameters (dt, escape radius, metric params) are passed through SMEM
so retuning them does not recompile; tile geometry / max_steps / unroll are
compile-time.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from curvis_tpu.metrics.base import (EllisMetric, FlatSphericalMetric,
                                     InterstellarMetric, Metric,
                                     SchwarzschildMetric)
from curvis_tpu.physics.planar import PlanarRays, PlanarResult

LANES = 128


def _atan_poly(x):
    """Branchless arctan for the Mosaic kernel (no atan lowering on TPU
    Pallas): Cephes atanf range reduction + degree-4 polynomial in x^2,
    ~1-2 ulp in f32.  All branches computed, selected with where (finite
    everywhere thanks to the guarded reciprocal)."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t3 = ax > 2.414213562373095        # tan(3*pi/8)
    t1 = ax > 0.4142135623730950       # tan(pi/8)
    safe_ax = jnp.maximum(ax, 1e-30)
    xr = jnp.where(t3, -1.0 / safe_ax,
                   jnp.where(t1, (ax - 1.0) / (ax + 1.0), ax))
    base = jnp.where(t3, jnp.pi / 2, jnp.where(t1, jnp.pi / 4, 0.0))
    z = xr * xr
    poly = (((8.05374449538e-2 * z - 1.38776856032e-1) * z
             + 1.99777106478e-1) * z - 3.33329491539e-1) * z * xr + xr
    return sign * (base + poly)


def _shape_fns(kind: str):
    """Inlined (r2, r_deriv_over_r3) for each metric family.

    Returns f(params, l) -> (r2, dr_over_r3) where dr_over_r3 = r'(l)/r(l)^3,
    the only combination the planar RHS needs.  params is a (1, 8) SMEM row.
    """
    if kind == "ellis":
        def fns(pr, l):
            rho = pr[0, 2]
            r2 = rho * rho + l * l
            inv = 1.0 / r2
            # r' / r^3 = (l / r) / r^3 = l / r2^2
            return inv, l * inv * inv
        return fns
    if kind == "flat":
        def fns(pr, l):
            r2 = l * l
            inv = 1.0 / r2
            r = jnp.sqrt(r2)
            return inv, inv / r                 # r' = 1 -> r'/r^3 = 1/r^3
        return fns
    if kind == "interstellar":
        def fns(pr, l):
            m, a, rho = pr[0, 2], pr[0, 3], pr[0, 4]
            al = jnp.abs(l)
            x = 2.0 * (al - a) / (jnp.pi * m)
            atx = _atan_poly(x)
            r_out = rho + m * (x * atx - 0.5 * jnp.log(1.0 + x * x))
            outside = al > a
            r = jnp.where(outside, r_out, rho)
            dr = jnp.where(outside, (2.0 / jnp.pi) * jnp.sign(l) * atx, 0.0)
            r2 = r * r
            inv = 1.0 / r2
            return inv, dr * inv / r
        return fns
    raise NotImplementedError(f"pallas march: unsupported metric kind {kind!r}")


def _deriv_fns(kind: str):
    """Full planar derivative triple f(pr, l, p_l, b, b2) -> (dl, dpsi, dpl).

    Unit-lapse metrics (the reference family) use the shape-function form;
    'schwarzschild' inlines the general static system with A = 1 - 2M/l:
        dl = A p_l;  dpsi = b/l^2;  dpl = -A'/2 (1/A^2 + p_l^2) + b^2/l^3
    """
    if kind == "schwarzschild":
        def fns(pr, l, p_l, b, b2):
            M = pr[0, 2]
            invl = 1.0 / l
            invl2 = invl * invl
            A = 1.0 - 2.0 * M * invl
            invA = 1.0 / A
            dl = A * p_l
            dpsi = b * invl2
            dpl = (-M * invl2) * (invA * invA + p_l * p_l) + b2 * invl2 * invl
            return dl, dpsi, dpl
        return fns
    shape = _shape_fns(kind)

    def fns(pr, l, p_l, b, b2):
        inv, dr_r3 = shape(pr, l)
        return p_l, b * inv, b2 * dr_r3
    return fns


_NO_CAPTURE = -1e30      # sentinel capture radius (never reached)


def _metric_kind_and_params(metric: Metric, dt, escape_radius, dtype):
    """(kind, (1, 10) SMEM param row):
    [dt, R, p0, p1, p2, capture_radius, rtol, atol, dt_max, 0].
    Built with jnp so traced metric parameters stay traced (no recompiles
    when retuning dt / R / params under jit)."""
    def row(vals, capture=_NO_CAPTURE):
        vals = list(vals) + [0.0] * (5 - len(vals))
        vals = vals + [capture]
        vals = [jnp.asarray(v, dtype=dtype) for v in vals]
        vals += [jnp.zeros((), dtype=dtype)] * (10 - len(vals))
        return jnp.stack(vals).reshape(1, 10)
    if isinstance(metric, EllisMetric):
        return "ellis", row([dt, escape_radius, metric.rho])
    if isinstance(metric, InterstellarMetric):
        return "interstellar", row([dt, escape_radius, metric.m, metric.a,
                                    metric.rho])
    if isinstance(metric, FlatSphericalMetric):
        return "flat", row([dt, escape_radius])
    if isinstance(metric, SchwarzschildMetric):
        return "schwarzschild", row([dt, escape_radius, metric.m],
                                    capture=metric.capture_radius)
    raise NotImplementedError(
        f"pallas march: unsupported metric {type(metric).__name__}")


def _march_kernel(kind: str, max_steps: int, unroll: int,
                  params_ref, l_ref, psi_ref, pl_ref, b_ref,
                  ol_ref, opsi_ref, opl_ref, osign_ref, osteps_ref):
    """Lean masked Euler march.

    Frozen rays are masked *arithmetically* (per-ray effective dt of 0) —
    x += 0 * dx is exact for finite values, so frozen state is untouched
    without select chains.  The escape sign is accumulated as a float
    (sign += alive * ((l > R) - (l < -R))), which latches at +-1 on the first
    crossing and zeroes `alive` from the next sub-step on.  ~13 VPU ops per
    ray-step vs ~25 for the select-based formulation.  ``max_steps`` must be
    a multiple of ``unroll`` (enforced by the wrapper) so the iteration cap
    is exact.
    """
    deriv = _deriv_fns(kind)
    dt = params_ref[0, 0]
    R = params_ref[0, 1]
    r_cap = params_ref[0, 5]

    l = l_ref[:]
    psi = psi_ref[:]
    p_l = pl_ref[:]
    b = b_ref[:]
    b2 = b * b
    one = jnp.ones_like(l)
    zero = jnp.zeros_like(l)
    sign = jnp.zeros_like(l)

    # Phase 1 — maskless sprint.  Null normalization bounds the coordinate
    # speed: |dl/dlambda| = sqrt(1 - A b^2/r^2) <= 1 (unit-lapse metrics
    # have A = 1), so |l| moves at most dt per step: no ray can escape or
    # be captured before min(R - max|l|, min l - r_cap)/dt steps.  Run that
    # prefix with the bare step (no masking, no checks); semantics identical
    # since dt*1.0 masking is exact for active rays.
    # 5% margin: Euler drift lets the speed exceed 1 by O(1e-3); the sprint
    # must provably end before any ray can terminate.
    m0 = jnp.max(jnp.abs(l))
    d_free = jnp.minimum(R - m0, jnp.min(l) - r_cap)
    k_free = jnp.floor(d_free / (dt * 1.05) - 2.0).astype(jnp.int32)
    k_free = jnp.clip(k_free, 0, max_steps)
    k_free = (k_free // unroll) * unroll

    def sprint(i, c):
        l, psi, p_l = c
        for _ in range(unroll):
            dl, dpsi, dpl = deriv(params_ref, l, p_l, b, b2)
            l = l + dt * dl
            psi = psi + dt * dpsi
            p_l = p_l + dt * dpl
        return l, psi, p_l

    l, psi, p_l = lax.fori_loop(0, k_free // unroll, sprint, (l, psi, p_l))
    steps = jnp.zeros_like(l) + k_free.astype(l.dtype)

    # Phase 2 — masked stepping with per-step termination checks (exact
    # reference escape semantics + capture) until the tile fully terminates.
    def cond(c):
        _, _, _, sign, _, it = c
        return (it < max_steps) & jnp.any(sign == 0.0)

    def body(c):
        l, psi, p_l, sign, steps, it = c
        for _ in range(unroll):
            alive = jnp.where(sign == 0.0, one, zero)
            dte = dt * alive
            dl, dpsi, dpl = deriv(params_ref, l, p_l, b, b2)
            l = l + dte * dl
            psi = psi + dte * dpsi
            p_l = p_l + dte * dpl
            sign = sign + alive * (jnp.where(l > R, one, zero)
                                   - jnp.where(l < -R, one, zero)
                                   + 2.0 * jnp.where(l < r_cap, one, zero))
            steps = steps + alive
        return l, psi, p_l, sign, steps, it + unroll

    l, psi, p_l, sign, steps, _ = lax.while_loop(
        cond, body, (l, psi, p_l, sign, steps, k_free))

    ol_ref[:] = l
    opsi_ref[:] = psi
    opl_ref[:] = p_l
    osign_ref[:] = sign.astype(jnp.int32)
    osteps_ref[:] = steps.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("kind", "max_steps", "tile_rows",
                                             "unroll", "interpret"))
def _march_flat_arrays(kind, params, l, psi, p_l, b, *, max_steps, tile_rows,
                       unroll, interpret=False):
    """l/psi/p_l/b are (n_rows, 128); grid tiles rows by ``tile_rows``."""
    n_rows = l.shape[0]
    grid = (n_rows // tile_rows,)
    dtype = l.dtype

    def row_spec():
        return pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_march_kernel, kind, max_steps, unroll)
    out_shape = [
        jax.ShapeDtypeStruct((n_rows, LANES), dtype),       # l
        jax.ShapeDtypeStruct((n_rows, LANES), dtype),       # psi
        jax.ShapeDtypeStruct((n_rows, LANES), dtype),       # p_l
        jax.ShapeDtypeStruct((n_rows, LANES), jnp.int32),   # sign
        jax.ShapeDtypeStruct((n_rows, LANES), jnp.int32),   # steps
    ]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 10), lambda i: (0, 0), memory_space=pltpu.SMEM),
            row_spec(), row_spec(), row_spec(), row_spec(),
        ],
        out_specs=[row_spec()] * 5,
        out_shape=out_shape,
        interpret=interpret,
    )(params, l, psi, p_l, b)


def march_planar_pallas(metric: Metric, rays: PlanarRays, *, dt, max_steps,
                        escape_radius, stepper="euler", tile_rows=64,
                        unroll=8, sort=True, interpret=False) -> PlanarResult:
    """Pallas planar march with the same contract as march_planar_tiled."""
    if stepper != "euler":
        raise NotImplementedError("pallas march currently implements the "
                                  "(reference-parity) Euler stepper")
    # The kernel's masked phase gates only on sign, so the iteration bound
    # must hit max_steps exactly: shrink unroll to a divisor rather than
    # rounding the cap up (an overshoot would let a ray escape with sign +-1
    # where the while/scan backends report 0 — pinned by
    # tests/test_planar.py::test_backends_agree_at_step_cap).
    while max_steps % unroll:
        unroll //= 2
    kind, params = _metric_kind_and_params(metric, dt, escape_radius,
                                           rays.l.dtype)

    n = rays.l.reshape(-1).shape[0]
    block = tile_rows * LANES
    n_pad = -(-n // block) * block

    def pad(a):
        a = a.reshape(-1)
        return jnp.concatenate([a, jnp.full((n_pad - n,), a[0], a.dtype)])

    l, psi, p_l, b = (pad(rays.l), pad(rays.psi), pad(rays.p_l), pad(rays.b))
    if sort:
        key = jnp.where(p_l < 0, 100.0 + b, b)
        order = jnp.argsort(key)
        inv_order = jnp.argsort(order)
        l, psi, p_l, b = (a[order] for a in (l, psi, p_l, b))

    shape2 = (n_pad // LANES, LANES)
    outs = _march_flat_arrays(kind, params,
                              l.reshape(shape2), psi.reshape(shape2),
                              p_l.reshape(shape2), b.reshape(shape2),
                              max_steps=max_steps, tile_rows=tile_rows,
                              unroll=unroll, interpret=interpret)
    l, psi, p_l, sign, steps = (a.reshape(-1) for a in outs)
    if sort:
        l, psi, p_l, sign, steps = (a[inv_order]
                                    for a in (l, psi, p_l, sign, steps))
    out_shape = rays.l.shape
    return PlanarResult(l[:n].reshape(out_shape), psi[:n].reshape(out_shape),
                        p_l[:n].reshape(out_shape),
                        sign[:n].reshape(out_shape),
                        steps[:n].reshape(out_shape))


# ---------------------------------------------------------------------------
# Adaptive RK45 kernel (quality mode): Dormand-Prince 5(4), per-ray dt,
# accept/reject, escape interpolation to |l| = R (integrate/rk45.py semantics,
# VMEM-resident).
# ---------------------------------------------------------------------------

_DP_A = [
    [],
    [1 / 5],
    [3 / 40, 9 / 40],
    [44 / 45, -56 / 15, 32 / 9],
    [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729],
    [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656],
    [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84],
]
_DP_B5 = [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0]
_DP_B4 = [5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200,
          187 / 2100, 1 / 40]


def _rk45_kernel(kind: str, max_steps: int, max_iters: int,
                 params_ref, l_ref, psi_ref, pl_ref, b_ref,
                 ol_ref, opsi_ref, opl_ref, osign_ref, osteps_ref):
    deriv = _deriv_fns(kind)
    R = params_ref[0, 1]
    dt0 = params_ref[0, 0]
    r_cap = params_ref[0, 5]
    rtol = params_ref[0, 6]
    atol = params_ref[0, 7]
    dt_max = params_ref[0, 8]

    l = l_ref[:]
    psi = psi_ref[:]
    p_l = pl_ref[:]
    b = b_ref[:]
    b2 = b * b
    one = jnp.ones_like(l)
    zero = jnp.zeros_like(l)
    dt = jnp.full_like(l, 1.0) * dt0
    sign = jnp.zeros_like(l)
    steps = jnp.zeros_like(l)

    def rhs(li, pli):
        return deriv(params_ref, li, pli, b, b2)

    def cond(c):
        _, _, _, _, sign, _, it = c
        return (it < max_iters) & jnp.any(sign == 0.0)

    def body(c):
        l, psi, p_l, dt, sign, steps, it = c
        alive = jnp.where((sign == 0.0) & (steps < max_steps), one, zero)
        ks = []
        for i in range(7):
            li = l
            pli = p_l
            for j, a in enumerate(_DP_A[i]):
                li = li + dt * a * ks[j][0]
                pli = pli + dt * a * ks[j][2]
            ks.append(rhs(li, pli))

        def comb(w, comp):
            acc = zero
            for wi, k in zip(w, ks):
                if wi != 0.0:
                    acc = acc + wi * k[comp]
            return acc

        d5l, d5p, d5pl = comb(_DP_B5, 0), comb(_DP_B5, 1), comb(_DP_B5, 2)
        e_l = d5l - comb(_DP_B4, 0)
        e_p = d5p - comb(_DP_B4, 1)
        e_pl = d5pl - comb(_DP_B4, 2)
        l5 = l + dt * d5l
        psi5 = psi + dt * d5p
        pl5 = p_l + dt * d5pl

        def ec(e, y0, y1):
            return jnp.abs(dt * e) / (atol + rtol * jnp.maximum(
                jnp.abs(y0), jnp.abs(y1)))

        err = jnp.maximum(ec(e_l, l, l5),
                          jnp.maximum(ec(e_p, psi, psi5),
                                      ec(e_pl, p_l, pl5)))
        accept = alive * jnp.where(err <= 1.0, one, zero)

        esc_pos = accept * jnp.where(l5 > R, one, zero)
        esc_neg = accept * jnp.where(l5 < -R, one, zero)
        esc = esc_pos + esc_neg
        target = jnp.where(esc_pos > 0, R, -R)
        denom = l5 - l
        denom = jnp.where(jnp.abs(denom) < 1e-30, one, denom)
        frac = jnp.clip((target - l) / denom, 0.0, 1.0)
        frac = jnp.where(esc > 0, frac, one)

        l = l + accept * frac * (l5 - l)
        psi = psi + accept * frac * (psi5 - psi)
        p_l = p_l + accept * frac * (pl5 - p_l)
        capd = accept * jnp.where((l < r_cap) & (sign == 0.0), one, zero)
        sign = sign + esc_pos - esc_neg + 2.0 * capd
        steps = steps + accept

        err_s = jnp.maximum(err, 1e-10)
        # clip(0.9 * err^-0.2, 0.2, 5.0) without pow: err^-0.2 via
        # exp(-0.2 ln err)
        factor = jnp.clip(0.9 * jnp.exp(-0.2 * jnp.log(err_s)), 0.2, 5.0)
        newdt = jnp.clip(dt * factor, 1e-6, dt_max)
        dt = jnp.where((alive > 0) & (esc == 0.0), newdt, dt)
        # rays that hit the step cap freeze with a sentinel
        capped = (sign == 0.0) & (steps >= max_steps)
        sign = jnp.where(capped, -128.0, sign)
        return l, psi, p_l, dt, sign, steps, it + 1

    l, psi, p_l, dt, sign, steps, _ = lax.while_loop(
        cond, body, (l, psi, p_l, dt, sign, steps, jnp.int32(0)))
    sign = jnp.where(sign == -128.0, zero, sign)
    ol_ref[:] = l
    opsi_ref[:] = psi
    opl_ref[:] = p_l
    osign_ref[:] = sign.astype(jnp.int32)
    osteps_ref[:] = steps.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("kind", "max_steps", "max_iters",
                                             "tile_rows", "interpret"))
def _rk45_flat_arrays(kind, params, l, psi, p_l, b, *, max_steps, max_iters,
                      tile_rows, interpret=False):
    n_rows = l.shape[0]
    grid = (n_rows // tile_rows,)
    dtype = l.dtype

    def row_spec():
        return pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_rk45_kernel, kind, max_steps, max_iters)
    out_shape = [
        jax.ShapeDtypeStruct((n_rows, LANES), dtype),
        jax.ShapeDtypeStruct((n_rows, LANES), dtype),
        jax.ShapeDtypeStruct((n_rows, LANES), dtype),
        jax.ShapeDtypeStruct((n_rows, LANES), jnp.int32),
        jax.ShapeDtypeStruct((n_rows, LANES), jnp.int32),
    ]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 10), lambda i: (0, 0), memory_space=pltpu.SMEM),
            row_spec(), row_spec(), row_spec(), row_spec(),
        ],
        out_specs=[row_spec()] * 5,
        out_shape=out_shape,
        interpret=interpret,
    )(params, l, psi, p_l, b)


def march_planar_rk45_pallas(metric: Metric, rays: PlanarRays, *,
                             escape_radius, max_steps=10_000, rtol=1e-5,
                             atol=1e-7, dt0=0.05, dt_max=10.0, tile_rows=64,
                             interpret=False) -> PlanarResult:
    """Pallas adaptive RK45 march (integrate/rk45.py semantics on-device)."""
    kind, params = _metric_kind_and_params(metric, dt0, escape_radius,
                                           rays.l.dtype)
    params = jnp.concatenate(
        [params[:, :6],
         jnp.asarray([[rtol, atol, dt_max, 0.0]], params.dtype)], axis=1)

    n = rays.l.reshape(-1).shape[0]
    block = tile_rows * LANES
    n_pad = -(-n // block) * block

    def pad(a):
        a = a.reshape(-1)
        return jnp.concatenate([a, jnp.full((n_pad - n,), a[0], a.dtype)])

    l, psi, p_l, b = (pad(rays.l), pad(rays.psi), pad(rays.p_l), pad(rays.b))
    shape2 = (n_pad // LANES, LANES)
    outs = _rk45_flat_arrays(kind, params, l.reshape(shape2),
                             psi.reshape(shape2), p_l.reshape(shape2),
                             b.reshape(shape2), max_steps=max_steps,
                             max_iters=4 * max_steps, tile_rows=tile_rows,
                             interpret=interpret)
    l, psi, p_l, sign, steps = (a.reshape(-1) for a in outs)
    out_shape = rays.l.shape
    return PlanarResult(l[:n].reshape(out_shape), psi[:n].reshape(out_shape),
                        p_l[:n].reshape(out_shape),
                        sign[:n].reshape(out_shape),
                        steps[:n].reshape(out_shape))


def march_pallas(metric, x0, p0, *, dt, max_steps, escape_radius,
                 stepper="euler"):
    """4-state API shim — the pallas path is planar-only; callers use
    march_planar_pallas via render_direct(method='planar')."""
    raise NotImplementedError("use march_planar_pallas (planar reduction)")


# ---------------------------------------------------------------------------
# Disk-march kernel: planar march + equatorial-plane crossing capture
# (render/disk.py semantics, VMEM-resident).  Tracks z = r(l)(c1 cos psi +
# c2 sin psi) with an incrementally rotated (cos psi, sin psi) pair and
# records the first two crossing (radius, p_l) pairs.
# ---------------------------------------------------------------------------

def _disk_kernel(kind: str, max_steps: int, unroll: int,
                 params_ref, l_ref, psi_ref, pl_ref, b_ref, c1_ref, c2_ref,
                 ol_ref, opsi_ref, opl_ref, osign_ref, osteps_ref,
                 oh1_ref, oh1p_ref, oh2_ref, oh2p_ref):
    deriv = _deriv_fns(kind)
    dt = params_ref[0, 0]
    R = params_ref[0, 1]
    r_cap = params_ref[0, 5]
    r_in = params_ref[0, 6]
    r_out = params_ref[0, 7]

    l = l_ref[:]
    psi = psi_ref[:]
    p_l = pl_ref[:]
    b = b_ref[:]
    c1 = c1_ref[:]
    c2 = c2_ref[:]
    b2 = b * b
    one = jnp.ones_like(l)
    zero = jnp.zeros_like(l)
    sign = jnp.zeros_like(l)
    steps = jnp.zeros_like(l)
    u = jnp.cos(psi)
    v = jnp.sin(psi)
    # z / r(l): crossing detection only needs the sign, and c1 u + c2 v
    # avoids recomputing r(l) for z
    zq = c1 * u + c2 * v
    h1 = jnp.zeros_like(l)
    h1p = jnp.zeros_like(l)
    h2 = jnp.zeros_like(l)
    h2p = jnp.zeros_like(l)

    def cond(c):
        sign = c[7]
        it = c[12]
        return (it < max_steps) & jnp.any(sign == 0.0)

    def body(c):
        l, psi, p_l, u, v, zq, steps, sign, h1, h1p, h2, h2p, it = c
        for _ in range(unroll):
            alive = jnp.where(sign == 0.0, one, zero)
            dte = dt * alive
            dl, dpsi, dpl = deriv(params_ref, l, p_l, b, b2)
            l1 = l + dte * dl
            pl1 = p_l + dte * dpl
            du = dte * dpsi
            u1 = u - v * du
            v1 = v + u * du
            zq1 = c1 * u1 + c2 * v1
            # crossing: sign change of z (r > 0 so zq sign == z sign)
            crossed = alive * jnp.where(zq * zq1 < 0.0, one, zero)
            denom = jnp.abs(zq) + jnp.abs(zq1)
            frac = jnp.abs(zq) / jnp.maximum(denom, 1e-30)
            r_hit = jnp.abs(l + frac * (l1 - l))
            in_disk = crossed * jnp.where(r_hit >= r_in, one, zero) \
                * jnp.where(r_hit <= r_out, one, zero)
            pl_hit = p_l + frac * (pl1 - p_l)
            new1 = in_disk * jnp.where(h1 == 0.0, one, zero)
            new2 = in_disk * jnp.where(h1 != 0.0, one, zero) \
                * jnp.where(h2 == 0.0, one, zero)
            h1 = h1 + new1 * r_hit
            h1p = h1p + new1 * pl_hit
            h2 = h2 + new2 * r_hit
            h2p = h2p + new2 * pl_hit
            l = l1
            psi = psi + dte * dpsi
            p_l = pl1
            u = u1
            v = v1
            zq = zq1
            sign = sign + alive * (jnp.where(l > R, one, zero)
                                   - jnp.where(l < -R, one, zero)
                                   + 2.0 * jnp.where(l < r_cap, one, zero))
            steps = steps + alive
        return l, psi, p_l, u, v, zq, steps, sign, h1, h1p, h2, h2p, \
            it + unroll

    out = lax.while_loop(cond, body, (l, psi, p_l, u, v, zq, steps, sign,
                                      h1, h1p, h2, h2p, jnp.int32(0)))
    l, psi, p_l, _, _, _, steps, sign, h1, h1p, h2, h2p, _ = out
    ol_ref[:] = l
    opsi_ref[:] = psi
    opl_ref[:] = p_l
    osign_ref[:] = sign.astype(jnp.int32)
    osteps_ref[:] = steps.astype(jnp.int32)
    oh1_ref[:] = h1
    oh1p_ref[:] = h1p
    oh2_ref[:] = h2
    oh2p_ref[:] = h2p


@functools.partial(jax.jit, static_argnames=("kind", "max_steps", "tile_rows",
                                             "unroll", "interpret"))
def _disk_flat_arrays(kind, params, l, psi, p_l, b, c1, c2, *, max_steps,
                      tile_rows, unroll, interpret=False):
    n_rows = l.shape[0]
    grid = (n_rows // tile_rows,)
    dtype = l.dtype

    def row_spec():
        return pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_disk_kernel, kind, max_steps, unroll)
    f = jax.ShapeDtypeStruct((n_rows, LANES), dtype)
    i = jax.ShapeDtypeStruct((n_rows, LANES), jnp.int32)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 10), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ] + [row_spec()] * 6,
        out_specs=[row_spec()] * 9,
        out_shape=[f, f, f, i, i, f, f, f, f],
        interpret=interpret,
    )(params, l, psi, p_l, b, c1, c2)


def march_planar_disk_pallas(metric: Metric, rays: PlanarRays, c1, c2, *, dt,
                             max_steps, escape_radius, r_inner, r_outer,
                             tile_rows=32, unroll=8, interpret=False):
    """Pallas counterpart of render/disk.march_planar_disk."""
    while max_steps % unroll:        # exact step cap (see march_planar_pallas)
        unroll //= 2
    kind, params = _metric_kind_and_params(metric, dt, escape_radius,
                                           rays.l.dtype)
    params = jnp.concatenate(
        [params[:, :6],
         jnp.asarray([[r_inner, r_outer, 0.0, 0.0]], params.dtype)], axis=1)

    n = rays.l.reshape(-1).shape[0]
    block = tile_rows * LANES
    n_pad = -(-n // block) * block

    def pad(a):
        a = a.reshape(-1)
        return jnp.concatenate([a, jnp.full((n_pad - n,), a[0], a.dtype)])

    arrs = [pad(a) for a in (rays.l, rays.psi, rays.p_l, rays.b, c1, c2)]
    shape2 = (n_pad // LANES, LANES)
    outs = _disk_flat_arrays(kind, params, *(a.reshape(shape2) for a in arrs),
                             max_steps=max_steps, tile_rows=tile_rows,
                             unroll=unroll, interpret=interpret)
    outs = [a.reshape(-1)[:n].reshape(rays.l.shape) for a in outs]
    l, psi, p_l, sign, steps, h1, h1p, h2, h2p = outs
    return (PlanarResult(l, psi, p_l, sign, steps), (h1, h1p), (h2, h2p))
