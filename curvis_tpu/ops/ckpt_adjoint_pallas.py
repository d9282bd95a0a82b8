"""Pallas TPU kernels for the checkpointed-recompute adjoint.

TPU twin of integrate/ckpt.py (same discrete map, same masking contract —
read that module's docstring first).  Two kernels stream the trajectory's
segment-start checkpoints through HBM while all marching / VJP math stays
VMEM-resident:

  * **checkpoint generation** (`_ckpt_gen_kernel`): grid (ray-tiles,
    segments); the per-tile ray state is carried across the segment axis in
    VMEM scratch, each grid step first writes the segment-start state to its
    HBM checkpoint block, then advances ``seg`` masked steps with a
    ``fori_loop`` (one step body — compile size stays O(1) in ``seg``).
  * **backward sweep** (`_ckpt_bwd_kernel`): same grid with the segment
    axis *reversed* via the checkpoint BlockSpec index map.  Each grid step
    re-marches its segment forward, parking the ``seg`` intermediate states
    in VMEM scratch, then pulls the cotangent through the steps in reverse
    with ``jax.vjp`` of the single masked step — the VJP is traced once at
    kernel-build time and driven by a ``fori_loop``, so the Mosaic program
    is one step + one step-pullback regardless of ``seg``/``max_steps``.
    The adjoint state and per-lane parameter accumulators are VMEM scratch
    carried across the segment axis.

HBM traffic is the checkpoint buffer once out + once in: ``n_state x
ceil(max_steps/seg) x n_rays x 4`` bytes each way (~0.4 ms at HBM bandwidth
for a 147k-ray, 50-checkpoint f32 march) — negligible next to the compute.
(The backward kernel's y0/theta/steps/cot rows and lam/g outputs have
segment-constant block indices; the Pallas pipeline's revisiting elision
skips their per-segment DMAs — measured on-chip: forcing the input index
map to move costs exactly the 800 GB/s DMA bound, the s-constant map runs
4x faster, and guarding the output write changes nothing.  See NEXT.md
"CLOSED (measured no-ops)".)
Segment-state scratch is ``n_state x seg x tile_rows x 128`` floats (~0.7 MB
for the Kerr 5-state at seg=16, tile_rows=16), comfortably VMEM-resident.
Everything is elementwise VPU work, (8, 128)-tiled SoA like every marcher in
ops/march_pallas.py.

Why not reverse-time replay (round-2's first cut)?  Near a black hole the
step's local Lipschitz constant times dt exceeds 1, so fixed-point inversion
of the step diverges for exactly the rays that carry the lensing signal.
Checkpointed recompute is the forward map re-run — exact for every ray, and
cheaper (no polish iterations).

Step functions are supplied as builders so the same kernels serve every
system (planar Euler, Kerr/KN RK4, future families):

  ``make_step(params_ref) -> step(theta, y) -> y``

where ``params_ref`` is the (1, k) SMEM row of non-differentiated scalars
(dt, step-control knobs), ``theta`` is a tuple of per-lane *arrays* (metric
parameters broadcast per ray — so the VJP yields per-lane cotangents the
wrapper can sum — plus genuinely per-ray quantities like E, L, b), and ``y``
the state tuple.  The NaN-safety invariant of integrate/ckpt.py applies:
frozen states are *evaluated* under the mask every step, so callers
substitute a benign state for excluded rays.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _ckpt_gen_kernel(make_step, n_state, n_theta, seg, params_ref, *refs):
    """refs = y0 (n_state) + theta (n_theta) + steps, then ckpt outputs
    (n_state, block (1, tile, LANES)), then scratch carries (n_state)."""
    y0_refs = refs[:n_state]
    theta_refs = refs[n_state:n_state + n_theta]
    steps_ref = refs[n_state + n_theta]
    ckpt_refs = refs[n_state + n_theta + 1:n_state + n_theta + 1 + n_state]
    carry_refs = refs[n_state + n_theta + 1 + n_state:]
    s = pl.program_id(1)
    step = make_step(params_ref)
    theta = tuple(t[:] for t in theta_refs)
    steps = steps_ref[:]

    @pl.when(s == 0)
    def _():
        for c, y in zip(carry_refs, y0_refs):
            c[:] = y[:]

    y = tuple(c[:] for c in carry_refs)
    for i in range(n_state):
        ckpt_refs[i][0] = y[i]
    j_base = s * seg

    def body(k, y):
        y1 = step(theta, y)
        act = (j_base + k).astype(steps.dtype) < steps
        return tuple(jnp.where(act, a1, a0) for a0, a1 in zip(y, y1))

    y = lax.fori_loop(0, seg, body, y)
    for c, v in zip(carry_refs, y):
        c[:] = v


def _ckpt_bwd_kernel(make_step, n_state, n_theta, seg, n_seg, params_ref,
                     *refs):
    """refs = ckpt (n_state, pre-reversed blocks) + theta (n_theta) + steps
    + cot (n_state), then outputs lam (n_state) + g_theta (n_theta), then
    scratch: lam (n_state) + acc (n_theta) + segment states (n_state,
    (seg, tile, LANES))."""
    k0 = 0
    ckpt_refs = refs[k0:k0 + n_state]; k0 += n_state          # noqa: E702
    theta_refs = refs[k0:k0 + n_theta]; k0 += n_theta         # noqa: E702
    steps_ref = refs[k0]; k0 += 1                             # noqa: E702
    cot_refs = refs[k0:k0 + n_state]; k0 += n_state           # noqa: E702
    olam_refs = refs[k0:k0 + n_state]; k0 += n_state          # noqa: E702
    og_refs = refs[k0:k0 + n_theta]; k0 += n_theta            # noqa: E702
    slam_refs = refs[k0:k0 + n_state]; k0 += n_state          # noqa: E702
    sacc_refs = refs[k0:k0 + n_theta]; k0 += n_theta          # noqa: E702
    ys_refs = refs[k0:k0 + n_state]

    s = pl.program_id(1)
    step = make_step(params_ref)
    theta = tuple(t[:] for t in theta_refs)
    steps = steps_ref[:]

    @pl.when(s == 0)
    def _():
        for sl, c in zip(slam_refs, cot_refs):
            sl[:] = c[:]
        for sa in sacc_refs:
            sa[:] = jnp.zeros_like(sa)

    seg_idx = (n_seg - 1) - s
    j_base = seg_idx * seg

    # phase a: re-march the segment, parking each step's START state
    def fwd_body(k, y):
        for i in range(n_state):
            ys_refs[i][k] = y[i]
        y1 = step(theta, y)
        act = (j_base + k).astype(steps.dtype) < steps
        return tuple(jnp.where(act, a1, a0) for a0, a1 in zip(y, y1))

    lax.fori_loop(0, seg, fwd_body, tuple(c[0] for c in ckpt_refs))

    # phase b: pull the cotangent back step by step (one traced step-VJP)
    def bwd_body(t, carry):
        lam, acc = carry
        k = (seg - 1) - t
        y_k = tuple(ys_refs[i][k] for i in range(n_state))
        act = (j_base + k).astype(steps.dtype) < steps

        def mstep(th, y):
            y1 = step(th, y)
            return tuple(jnp.where(act, a1, a0) for a0, a1 in zip(y, y1))

        _, pull = jax.vjp(mstep, theta, y_k)
        d_theta, d_y = pull(lam)
        return d_y, tuple(a + d for a, d in zip(acc, d_theta))

    lam0 = tuple(sl[:] for sl in slam_refs)
    acc0 = tuple(sa[:] for sa in sacc_refs)
    lam, acc = lax.fori_loop(0, seg, bwd_body, (lam0, acc0))
    for sl, v in zip(slam_refs, lam):
        sl[:] = v
    for sa, v in zip(sacc_refs, acc):
        sa[:] = v
    # outputs carry the running value; the final grid step's write (segment
    # 0, the spawn end) is what lands in HBM
    for o, sl in zip(olam_refs, slam_refs):
        o[:] = sl[:]
    for o, sa in zip(og_refs, sacc_refs):
        o[:] = sa[:]


@functools.partial(jax.jit, static_argnames=("make_step", "n_state",
                                             "n_theta", "seg", "n_seg",
                                             "tile_rows", "interpret"))
def _ckpt_adjoint_arrays(make_step, n_state, n_theta, seg, n_seg, tile_rows,
                         params, y0, theta, steps, cot, interpret=False):
    """(n_rows, LANES)-shaped driver: runs checkpoint generation then the
    reverse sweep; returns (lam tuple, per-lane g_theta tuple)."""
    n_rows = y0[0].shape[0]
    n_tiles = n_rows // tile_rows
    dtype = y0[0].dtype
    k_params = params.shape[1]

    def row_spec():
        return pl.BlockSpec((tile_rows, LANES), lambda i, s: (i, 0),
                            memory_space=pltpu.VMEM)

    def smem_spec():
        return pl.BlockSpec((1, k_params), lambda i, s: (0, 0),
                            memory_space=pltpu.SMEM)

    row = jax.ShapeDtypeStruct((n_rows, LANES), dtype)
    ckpt_shape = jax.ShapeDtypeStruct((n_seg, n_rows, LANES), dtype)
    gen = functools.partial(_ckpt_gen_kernel, make_step, n_state, n_theta,
                            seg)
    ckpts = pl.pallas_call(
        gen,
        grid=(n_tiles, n_seg),
        in_specs=[smem_spec()] + [row_spec()] * (n_state + n_theta + 1),
        out_specs=[pl.BlockSpec((1, tile_rows, LANES),
                                lambda i, s: (s, i, 0),
                                memory_space=pltpu.VMEM)] * n_state,
        out_shape=[ckpt_shape] * n_state,
        scratch_shapes=[pltpu.VMEM((tile_rows, LANES), dtype)] * n_state,
        interpret=interpret,
    )(params, *y0, *theta, steps)

    bwd = functools.partial(_ckpt_bwd_kernel, make_step, n_state, n_theta,
                            seg, n_seg)
    outs = pl.pallas_call(
        bwd,
        grid=(n_tiles, n_seg),
        in_specs=[smem_spec()]
        + [pl.BlockSpec((1, tile_rows, LANES),
                        lambda i, s, _n=n_seg: (_n - 1 - s, i, 0),
                        memory_space=pltpu.VMEM)] * n_state
        + [row_spec()] * (n_theta + 1 + n_state),
        out_specs=[row_spec()] * (n_state + n_theta),
        out_shape=[row] * (n_state + n_theta),
        scratch_shapes=[pltpu.VMEM((tile_rows, LANES), dtype)]
        * (n_state + n_theta)
        + [pltpu.VMEM((seg, tile_rows, LANES), dtype)] * n_state,
        interpret=interpret,
    )(params, *ckpts, *theta, steps, *cot)
    return tuple(outs[:n_state]), tuple(outs[n_state:])


def ckpt_adjoint_backward_pallas(make_step, params, y0, theta, steps, cot, *,
                                 max_steps, seg=16, tile_rows=16,
                                 interpret=False):
    """Exact pullback of the masked march through the Pallas kernel pair.

    Flat-array front door: ``y0``/``cot`` are n_state-tuples and ``theta``
    an n_theta-tuple of (n,) arrays (per-lane parameter broadcasts included),
    ``steps`` the per-ray active-step counts (any numeric dtype), ``params``
    the (1, k) SMEM scalar row consumed by ``make_step``.  Returns
    ``(d_y0 tuple, per-ray d_theta tuple)`` — the caller sums the broadcast
    slots.  NB: this is the TRANSPOSE of the XLA twin's order
    (integrate/ckpt.ckpt_adjoint_backward returns ``(d_theta, d_y0)``);
    every backend-switching caller unpacks per branch.  ``make_step`` must
    be hashable-stable (module-level function or cached partial) so the jit
    cache keys correctly."""
    dtype = y0[0].dtype
    n_state, n_theta = len(y0), len(theta)
    n_seg = -(-max_steps // seg)
    n = y0[0].shape[0]
    if max_steps == 0 or n == 0:
        # exact degenerate gradient, matching the XLA twin (a zero-length
        # replay is the identity map): d_y0 = cot, d_theta = 0.  Without
        # this guard the grids below are zero-trip and the output buffers
        # come back unwritten.
        return (tuple(jnp.asarray(c) for c in cot),
                tuple(jnp.zeros_like(jnp.asarray(t)) for t in theta))
    block = tile_rows * LANES
    n_pad = -(-n // block) * block

    def pad(a, fill=None, dt=dtype):
        a = a.reshape(-1).astype(dt)
        f = a[0] if fill is None else jnp.asarray(fill, dt)
        return jnp.concatenate([a, jnp.full((n_pad - n,), f, dt)])

    shape2 = (n_pad // LANES, LANES)
    y0p = tuple(pad(a).reshape(shape2) for a in y0)          # benign fill
    thetap = tuple(pad(a).reshape(shape2) for a in theta)
    # steps rides in a dtype that represents its integer range exactly —
    # a bf16/f16 state tuple must not truncate counts > 256 (the replay
    # mask would silently march a different trajectory than the forward)
    steps_dt = jnp.promote_types(dtype, jnp.float32)
    stepsp = pad(steps, 0.0, steps_dt).reshape(shape2)       # padded frozen
    cotp = tuple(pad(a, 0.0).reshape(shape2) for a in cot)
    lam, g = _ckpt_adjoint_arrays(make_step, n_state, n_theta, seg, n_seg,
                                  tile_rows, params, y0p, thetap, stepsp,
                                  cotp, interpret=interpret)
    unpack = lambda a: a.reshape(-1)[:n]                     # noqa: E731
    return tuple(unpack(a) for a in lam), tuple(unpack(a) for a in g)
