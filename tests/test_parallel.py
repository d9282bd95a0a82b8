"""Multi-device sharding on the 8-virtual-CPU mesh (SURVEY.md section 4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import curvis_tpu as cv
from curvis_tpu.metrics.base import EllisMetric
from curvis_tpu.parallel.mesh import make_mesh
from curvis_tpu.parallel.sharded import (make_train_step,
                                         render_direct_sharded)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

KW = dict(dt=0.05, max_steps=2000, escape_radius=20.0)


def _scene(rng, res=(40, 22)):
    metric = EllisMetric(rho=jnp.asarray(1.0))
    cam = cv.make_camera([0.0, 5.0, np.pi / 2, 0.0], [-1.0, 0.3, 0.1],
                         [0.0, 0.0, 1.0], 15.0, 43.0, res[0], res[1],
                         dtype=jnp.float64)
    bg_p = cv.make_spherical_image(rng.random((16, 32, 3)), dtype=jnp.float64)
    bg_n = cv.make_spherical_image(rng.random((16, 32, 3)), dtype=jnp.float64)
    return metric, cam, bg_p, bg_n


def test_sharded_render_equals_single_device(rng):
    metric, cam, bg_p, bg_n = _scene(rng)
    mesh = make_mesh(8)
    img_sharded = np.asarray(jax.jit(
        lambda m, c, bp, bn: render_direct_sharded(m, c, bp, bn, mesh, **KW)
    )(metric, cam, bg_p, bg_n))
    img_single = np.asarray(cv.render_direct(metric, cam, bg_p, bg_n,
                                             method="planar",
                                             filtering="nearest", **KW))
    np.testing.assert_allclose(img_sharded, img_single, atol=1e-12)


def test_sharded_render_odd_ray_count(rng):
    """Ray counts not divisible by the mesh size are padded correctly."""
    metric, cam, bg_p, bg_n = _scene(rng, res=(37, 19))   # 703 rays, 703 % 8 != 0
    mesh = make_mesh(8)
    img = np.asarray(jax.jit(
        lambda m, c, bp, bn: render_direct_sharded(m, c, bp, bn, mesh, **KW)
    )(metric, cam, bg_p, bg_n))
    assert img.shape == (19, 37, 3)
    img_single = np.asarray(cv.render_direct(metric, cam, bg_p, bg_n,
                                             method="planar",
                                             filtering="nearest", **KW))
    np.testing.assert_allclose(img, img_single, atol=1e-12)


def test_train_step_grads_match_unsharded(rng):
    """The sharded training step's psum'd gradients equal single-device
    gradients."""
    metric, cam, bg_p, bg_n = _scene(rng, res=(24, 16))
    target = jnp.zeros((16, 24, 3), dtype=jnp.float64)
    mesh8 = make_mesh(8)
    mesh1 = make_mesh(1)
    lr = 1e-2
    step8 = jax.jit(make_train_step(mesh8, lr=lr, **KW))
    step1 = jax.jit(make_train_step(mesh1, lr=lr, **KW))
    m8, c8, l8 = step8(metric, cam, bg_p, bg_n, target)
    m1, c1, l1 = step1(metric, cam, bg_p, bg_n, target)
    np.testing.assert_allclose(float(l8), float(l1), rtol=1e-12)
    np.testing.assert_allclose(float(m8.rho), float(m1.rho), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(c8.position),
                               np.asarray(c1.position), rtol=1e-10)
    # parameters actually moved
    assert float(m8.rho) != 1.0


def test_mesh_utilities():
    from curvis_tpu.parallel.mesh import pad_to_multiple
    a = jnp.arange(10)
    padded, n = pad_to_multiple(a, 8)
    assert padded.shape[0] == 16 and n == 10
    padded, n = pad_to_multiple(a, 5)
    assert padded.shape[0] == 10 and n == 10
    with pytest.raises(ValueError):
        make_mesh(999)


def test_shardmap_pallas_render_matches_single(rng):
    """Production pod path: shard_map with a per-shard Pallas kernel launch
    (interpret mode on the virtual CPU mesh).  Smooth textures + bilinear
    filtering so f32 ulp-level angle differences cannot flip whole texels:
    the sharded image must match the single-device while-backend image to
    1e-3 on >99.9% of pixels."""
    from curvis_tpu.parallel.sharded import render_direct_shardmap
    # pallas kernels are f32
    metric32 = EllisMetric(rho=jnp.asarray(1.0, jnp.float32))
    cam32 = cv.make_camera([0.0, 5.0, np.pi / 2, 0.0], [-1.0, 0.3, 0.1],
                           [0.0, 0.0, 1.0], 15.0, 43.0, 64, 32,
                           dtype=jnp.float32)
    h, w = 64, 128
    yy, xx = np.mgrid[0:h, 0:w]
    smooth = np.stack([xx / w, yy / h, 0.5 + 0 * xx], -1).astype("float32")
    bgp32 = cv.make_spherical_image(smooth)
    bgn32 = cv.make_spherical_image(smooth[::-1].copy())
    mesh = make_mesh(8)
    img = np.asarray(render_direct_shardmap(
        metric32, cam32, bgp32, bgn32, mesh, interpret=True,
        use_pallas=True, filtering="bilinear", **KW))
    ref = np.asarray(cv.render_direct(metric32, cam32, bgp32, bgn32,
                                      method="planar", filtering="bilinear",
                                      backend="while", **KW))
    assert img.shape == ref.shape
    d = np.abs(img - ref).max(-1)
    assert (d > 1e-3).mean() < 1e-3, (d > 1e-3).mean()
    assert np.median(d) < 1e-5


def test_frames_axis_sharded_render(rng):
    """2-D ('frames', 'rays') mesh: frame-batched render matches per-frame
    single-device renders exactly (f64)."""
    from curvis_tpu.parallel.mesh import make_mesh_2d
    from curvis_tpu.parallel.sharded import render_frames_sharded
    metric, _, bg_p, bg_n = _scene(rng)
    cams = [cv.make_camera([0.0, 5.0, np.pi / 2, 0.05 * k], [-1.0, 0.0, 0.0],
                           [0.0, 0.0, 1.0], 15.0, 43.0, 32, 16,
                           dtype=jnp.float64) for k in range(4)]
    mesh2 = make_mesh_2d(2, 4)
    assert mesh2.shape == {"frames": 2, "rays": 4}
    frames = np.asarray(jax.jit(lambda m, bp, bn: render_frames_sharded(
        m, cams, bp, bn, mesh2, **KW))(metric, bg_p, bg_n))
    assert frames.shape == (4, 16, 32, 3)
    from curvis_tpu.render.fast import render_planar_fast
    for k, cam in enumerate(cams):
        single = np.asarray(render_planar_fast(metric, cam, bg_p, bg_n,
                                               backend="tiled",
                                               filtering="nearest", **KW))
        # same SoA pipeline -> bit-identical frames regardless of sharding
        np.testing.assert_array_equal(frames[k], single)


def test_kerr_sharded_render_matches_batched(rng):
    """Sharded BL (Kerr) frames vs the single-device batched renderer —
    identical per-ray math; agreement to fusion-order ulps across the
    8-device mesh (incl. a volumetric Kerr-Newman disk on the charged
    path)."""
    import curvis_tpu as cv
    from curvis_tpu.metrics.kerr import KerrNewmanMetric
    from curvis_tpu.parallel.mesh import make_mesh
    from curvis_tpu.parallel.sharded import render_kerr_sharded
    from curvis_tpu.render.disk import DiskParams
    from curvis_tpu.render.kerr import render_kerr_frames_batched
    metric = KerrNewmanMetric(m=jnp.asarray(1.0), a=jnp.asarray(0.7),
                              q=jnp.asarray(0.4))
    th = np.pi / 2 - 0.25
    cams = [cv.make_camera([0.0, 20.0, th, 0.05 * k],
                           [-np.sin(th), 0.0, -np.cos(th)], [0.0, 0.0, 1.0],
                           30.0, 43.0, 16, 8, dtype=jnp.float64)
            for k in range(2)]
    bg = cv.make_spherical_image(rng.random((8, 16, 3)), dtype=jnp.float64)
    disk = DiskParams(r_inner=3.0, r_outer=10.0, volumetric=True, h_rel=0.1,
                      kappa=3.0, color_mode="blackbody", t_peak=7000.0)
    mesh = make_mesh(8)
    kw = dict(dt=0.1, max_steps=3000, escape_radius=45.0, disk=disk)
    sharded = jax.jit(lambda m, bp: render_kerr_sharded(
        m, cams, bp, mesh, **kw))(metric, bg)
    batched = render_kerr_frames_batched(metric, cams, bg, backend="xla",
                                         **kw)
    assert sharded.shape == (2, 8, 16, 3)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(batched),
                               rtol=0, atol=1e-12)


def test_kerr_rk45_sharded_matches_batched(rng):
    """The error-controlled DP5(4) march under GSPMD: per-ray adaptive dt
    is still per-ray math (the while_loop's any() termination becomes an
    all-reduce), so sharded frames must equal the single-device batched
    render; charged (Kerr-Newman) path."""
    import curvis_tpu as cv
    from curvis_tpu.metrics.kerr import KerrNewmanMetric
    from curvis_tpu.parallel.mesh import make_mesh
    from curvis_tpu.parallel.sharded import render_kerr_sharded
    from curvis_tpu.render.kerr import render_kerr_frames_batched
    metric = KerrNewmanMetric(m=jnp.asarray(1.0), a=jnp.asarray(0.7),
                              q=jnp.asarray(0.4))
    th = np.pi / 2 - 0.25
    cams = [cv.make_camera([0.0, 20.0, th, 0.05 * k],
                           [-np.sin(th), 0.0, -np.cos(th)], [0.0, 0.0, 1.0],
                           30.0, 43.0, 16, 8, dtype=jnp.float64)
            for k in range(2)]
    bg = cv.make_spherical_image(rng.random((8, 16, 3)), dtype=jnp.float64)
    mesh = make_mesh(8)
    kw = dict(dt=0.1, max_steps=4000, escape_radius=45.0,
              stepper="rk45", rtol=1e-5)
    sharded = jax.jit(lambda m, bp: render_kerr_sharded(
        m, cams, bp, mesh, **kw))(metric, bg)
    batched = render_kerr_frames_batched(metric, cams, bg, backend="xla",
                                         **kw)
    assert sharded.shape == (2, 8, 16, 3)
    assert np.isfinite(np.asarray(sharded)).all()
    # atol 1e-9, not 1e-12: GSPMD reassociates the readout einsum's 4-term
    # contraction across the partitioned batch, and bilinear texture
    # weights amplify the resulting half-ulp to ~1e-12 on isolated pixels
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(batched),
                               rtol=0, atol=1e-9)


# ---------------------------------------------------------------------------
# Round 4: per-device KERNEL launches under the mesh (VERDICT round-3 #5) —
# shard_map wrappers for the Kerr marchers and the Pallas adjoint pairs,
# interpret mode on the virtual 8-mesh.
# ---------------------------------------------------------------------------

def _kerr_scene(rng, n_cams=2, res=(16, 8)):
    from curvis_tpu.metrics.kerr import KerrMetric
    metric = KerrMetric(m=jnp.asarray(1.0, jnp.float32),
                        a=jnp.asarray(0.8, jnp.float32))
    # smooth deterministic background (independent of the session rng):
    # L2-loss gradient magnitudes through chaotic photon-ring pixels are
    # background-dependent, and the train-step assertions below need a
    # reproducible, texel-seam-free loss surface (CLAUDE.md invariant)
    yy, xx = np.mgrid[0:32, 0:64]
    smooth = np.stack([np.sin(2 * np.pi * xx / 64) * .5 + .5, yy / 32,
                       .3 + .4 * np.cos(2 * np.pi * yy / 32)],
                      -1).astype(np.float32)
    bg = cv.make_spherical_image(smooth)
    th = float(np.pi / 2 - 0.25)
    cams = [cv.make_camera([0.0, 20.0, th, 0.05 * k],
                           [-np.sin(th), 0.0, -np.cos(th)], [0.0, 0.0, 1.0],
                           30.0, 43.0, res[0], res[1], dtype=jnp.float32)
            for k in range(n_cams)]
    return metric, cams, bg


@pytest.mark.parametrize("stepper", ["rk4", "rk45"])
def test_kerr_shardmap_kernel_render_matches_batched(rng, stepper):
    """Per-shard Pallas kernel launches (interpret) reproduce the
    single-device batched render exactly — the march is per-ray, so
    sharding is pure partitioning."""
    from curvis_tpu.parallel.sharded import render_kerr_shardmap
    from curvis_tpu.render.kerr import render_kerr_frames_batched
    metric, cams, bg = _kerr_scene(rng)
    mesh = make_mesh(8)
    imgs = jax.jit(lambda m, bp: render_kerr_shardmap(
        m, cams, bp, mesh, dt=0.2, max_steps=256, escape_radius=45.0,
        stepper=stepper, interpret=True))(metric, bg)
    ref = render_kerr_frames_batched(metric, cams, bg, dt=0.2,
                                     max_steps=256, escape_radius=45.0,
                                     backend="xla", stepper=stepper,
                                     far_accel=False)
    d = np.abs(np.asarray(imgs) - np.asarray(ref)).max(-1)
    assert (d > 0.1).mean() < 0.02


@pytest.mark.parametrize("stepper", ["rk4", "rk45"])
def test_kerr_train_step_use_pallas_pair_per_shard(rng, stepper):
    """make_kerr_train_step(use_pallas=True): the checkpointed-recompute
    custom-VJP pair launches per device inside shard_map, and the
    replicated metric's cotangent psums across shards — spin gradient
    flows and the step moves a toward the target."""
    from curvis_tpu.metrics.kerr import KerrMetric
    from curvis_tpu.parallel.sharded import (make_kerr_train_step,
                                             render_kerr_shardmap)
    metric_t, cams, bg = _kerr_scene(rng, n_cams=1)
    mesh = make_mesh(8)
    target = jax.jit(lambda m, bp: render_kerr_shardmap(
        m, cams, bp, mesh, dt=0.2, max_steps=256, escape_radius=30.0,
        stepper=stepper, interpret=True))(metric_t, bg)
    m0 = KerrMetric(m=jnp.asarray(1.0, jnp.float32),
                    a=jnp.asarray(0.5, jnp.float32))
    step = jax.jit(make_kerr_train_step(mesh, dt=0.2, max_steps=256,
                                        escape_radius=30.0, lr=0.5,
                                        use_pallas=True, stepper=stepper,
                                        interpret=True))
    m1, loss = step(m0, cams, bg, target)
    assert np.isfinite(float(loss))
    # the target has higher spin; the psum'd gradient must move a upward
    # (correctness of the gradient VALUE is pinned separately by
    # test_kerr_shardmap_grad_matches_unsharded)
    assert float(m1.a) > 0.5


def test_kerr_shardmap_grad_matches_unsharded(rng):
    """Sharded (per-device pair) spin gradient == single-device adjoint
    gradient: partitioning a per-ray sum must not change its value."""
    from curvis_tpu.integrate.kerr_adjoint import march_kerr_adjoint
    from curvis_tpu.metrics.kerr import KerrMetric
    from curvis_tpu.parallel.sharded import march_kerr_shardmap
    from curvis_tpu.render.kerr import _spawn_kerr_rays
    metric, cams, bg = _kerr_scene(rng, n_cams=1)
    mesh = make_mesh(8)
    x0, p0 = _spawn_kerr_rays(metric, cams[0])

    def loss_sharded(a):
        m = KerrMetric(m=jnp.asarray(1.0, jnp.float32), a=a)
        x, p, sign, _ = march_kerr_shardmap(
            m, x0, p0, mesh, dt=0.2, max_steps=256, escape_radius=30.0,
            differentiable=True, interpret=True)
        return jnp.mean(jnp.where(sign == 1, jnp.sin(x[:, 3]) * p[:, 1],
                                  0.0))

    def loss_single(a):
        m = KerrMetric(m=jnp.asarray(1.0, jnp.float32), a=a)
        x, p, sign, _ = march_kerr_adjoint(
            m, x0, p0, dt=jnp.asarray(0.2, jnp.float32), max_steps=256,
            escape_radius=30.0, backend="pallas_interpret")
        return jnp.mean(jnp.where(sign == 1, jnp.sin(x[:, 3]) * p[:, 1],
                                  0.0))

    a0 = jnp.asarray(0.8, jnp.float32)
    gs = float(jax.jit(jax.grad(loss_sharded))(a0))
    g1 = float(jax.jit(jax.grad(loss_single))(a0))
    assert abs(gs - g1) / max(abs(g1), 1e-12) < 1e-4, (gs, g1)


def test_frames_shardmap_kernel_launch_per_device(rng):
    """Video pod path (render_frames_shardmap): ('frames','rays') mesh with
    one Pallas kernel launch per device over its (local frames x rays)
    block.  Per-ray kernel math is tile-composition-independent, so each
    frame must equal the rays-sharded kernel render of that camera."""
    from curvis_tpu.parallel.mesh import make_mesh, make_mesh_2d
    from curvis_tpu.parallel.sharded import (render_direct_shardmap,
                                             render_frames_shardmap)
    metric, _, bg_p, bg_n = _scene(rng)
    cams = [cv.make_camera([0.0, 5.0, np.pi / 2, 0.05 * k], [-1.0, 0.0, 0.0],
                           [0.0, 0.0, 1.0], 15.0, 43.0, 32, 16,
                           dtype=jnp.float64) for k in range(4)]
    mesh2 = make_mesh_2d(2, 4)
    frames = np.asarray(render_frames_shardmap(
        metric, cams, bg_p, bg_n, mesh2, interpret=True, use_pallas=True,
        **KW))
    assert frames.shape == (4, 16, 32, 3)
    mesh = make_mesh(8)
    for k, cam in enumerate(cams):
        single = np.asarray(render_direct_shardmap(
            metric, cam, bg_p, bg_n, mesh, interpret=True, use_pallas=True,
            **KW))
        np.testing.assert_array_equal(frames[k], single)


def test_kerr_sharded_starlight_matches_batched(rng):
    """Starlit Kerr frames (thin reflection AND in-gas scattering) through
    render_kerr_sharded == the single-device batched renderer (round-5
    late session: the sharded path now threads starlight_map)."""
    import curvis_tpu as cv
    from curvis_tpu.metrics.kerr import KerrMetric
    from curvis_tpu.parallel.mesh import make_mesh
    from curvis_tpu.parallel.sharded import render_kerr_sharded
    from curvis_tpu.render.disk import DiskParams
    from curvis_tpu.render.kerr import render_kerr_frames_batched
    from curvis_tpu.render.starlight import compute_kerr_starlight_map
    metric = KerrMetric(m=jnp.asarray(1.0), a=jnp.asarray(0.7))
    th = np.pi / 2 - 0.25
    cams = [cv.make_camera([0.0, 18.0, th, 0.05 * k],
                           [-np.sin(th), 0.0, -np.cos(th)], [0.0, 0.0, 1.0],
                           30.0, 43.0, 16, 8, dtype=jnp.float64)
            for k in range(2)]
    bg = cv.make_spherical_image(0.3 + 0.5 * rng.random((8, 16, 3)),
                                 dtype=jnp.float64)
    smap = compute_kerr_starlight_map(
        metric, bg, r_inner=3.0, r_outer=9.0, escape_radius=25.0, dt=0.1,
        max_steps=5000, n_r=6, n_phi=8, n_samples=8, backend="xla")
    mesh = make_mesh(8)
    for disk in (DiskParams(r_inner=3.0, r_outer=9.0, starlight=True,
                            brightness=0.3),
                 DiskParams(r_inner=3.0, r_outer=9.0, volumetric=True,
                            h_rel=0.1, kappa=2.0, starlight=True)):
        kw = dict(dt=0.1, max_steps=2000, escape_radius=40.0, disk=disk,
                  starlight_map=smap)
        sharded = jax.jit(lambda m, bp, d=disk: render_kerr_sharded(
            m, cams, bp, mesh, **kw))(metric, bg)
        batched = render_kerr_frames_batched(metric, cams, bg,
                                             backend="xla", **kw)
        assert sharded.shape == (2, 8, 16, 3)
        np.testing.assert_allclose(np.asarray(sharded),
                                   np.asarray(batched), rtol=0, atol=1e-9)
