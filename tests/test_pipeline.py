"""Camera paths, video pipeline, config system, CLI — end-to-end."""
import json
import subprocess
import sys

import numpy as np
import pytest

from curvis_tpu.camera.path import (CameraPath, generate_orbit_path,
                                    generate_through_path, load_path,
                                    save_path)
from curvis_tpu.config.settings import (CameraSettings, ImageSettings,
                                        MetricSettings, SettingsError,
                                        SimulationSettings, VideoSettings)


def test_path_roundtrip(tmp_path):
    p = generate_orbit_path(n=50)
    f = tmp_path / "orbit.csv"
    save_path(p, f)
    p2 = load_path(f)
    np.testing.assert_allclose(p2.positions, p.positions, atol=1e-12)
    np.testing.assert_allclose(p2.forwards, p.forwards, atol=1e-12)


def test_path_matches_reference_schema():
    """The shipped reference CSVs parse with our loader (same schema)."""
    ref = "/root/reference/paths/path_orbit.csv"
    import os
    if not os.path.exists(ref):
        pytest.skip("reference assets not mounted")
    p = load_path(ref)
    assert p.positions.shape[1] == 4 and len(p.positions) == 1000
    assert abs(p.min_time - 0.0) < 1e-12
    # orbit: constant radius 3, equatorial
    assert np.allclose(p.positions[:, 1], 3.0)
    assert np.allclose(p.positions[:, 2], np.pi / 2)


def test_interpolation_semantics():
    p = generate_through_path(n=100)
    pos, fwd, up = p.interpolate(p.min_time)
    np.testing.assert_allclose(pos, p.positions[0], atol=1e-12)
    # halfway between two waypoints lerps
    t0, t1 = p.positions[3, 0], p.positions[4, 0]
    pos, _, _ = p.interpolate(0.5 * (t0 + t1))
    np.testing.assert_allclose(
        pos, 0.5 * (p.positions[3] + p.positions[4]), atol=1e-12)
    with pytest.raises(ValueError):
        p.interpolate(p.max_time + 1.0)
    # batched times
    pos, fwd, up = p.interpolate(np.array([0.0, 1.0, 2.0]))
    assert pos.shape == (3, 4) and fwd.shape == (3, 3)


def test_frame_times_no_overrun():
    """No accumulated-float overrun past max_time (reference bug,
    README.md:107)."""
    p = generate_orbit_path(period=60.0, n=1000)
    times = p.frame_times(30.0)
    assert len(times) == 1800
    assert times[-1] < p.max_time
    p.interpolate(times)            # must not raise


def test_settings_defaults_match_reference():
    c = CameraSettings.from_toml()
    assert (c.resolution_x, c.resolution_y) == (960, 540)
    assert (c.diagonal, c.focal_length) == (43.0, 15.0)
    s = SimulationSettings.from_toml()
    assert s.ray_integration_max_iterations == 40_000
    assert s.ray_integration_step == 0.05
    i = ImageSettings.from_toml()
    assert i.position == [0.0, 5.0, 1.5707963267948966, 0.0]
    assert i.forward == [-1.0, 0.0, 0.0]
    m = MetricSettings.from_toml()
    assert m.kind == "ellis" and m.rho == 1.0


def test_settings_typo_alias_and_sniffing(tmp_path):
    # the reference's typo'd key is accepted
    f = tmp_path / "sim.toml"
    f.write_text("escape_radius = 50.0\nray_integration_max_itarations = 10\n"
                 "ray_integration_step = 0.1\nsampling_initial_nums = 10\n"
                 "sampling_max_iterations = 5\n"
                 "sampling_convergence_threshold_1 = 1e-4\n"
                 "sampling_convergence_threshold_2 = 1e-4\n")
    s = SimulationSettings.from_toml(f)
    assert s.ray_integration_max_iterations == 10
    # structural metric sniffing: interstellar schema first (cli.rs:233-261)
    f2 = tmp_path / "metric.toml"
    f2.write_text("m = 0.2\na = 0.001\nrho = 2.0\n")
    m = MetricSettings.from_toml(f2)
    assert m.kind == "interstellar" and m.m == 0.2
    f3 = tmp_path / "ellis.toml"
    f3.write_text("rho = 3.0\n")
    assert MetricSettings.from_toml(f3).kind == "ellis"


def test_settings_all_in_one(tmp_path):
    """ONE settings file (the reference's wishlist, README.md:117): any
    subset of sections, defaults for the rest, typo alias + metric
    sniffing still honored, relative camera path resolved against the
    file, unknown sections rejected."""
    from curvis_tpu.config.settings import load_settings
    (tmp_path / "orbit.csv").write_text(
        "t,l,theta,phi,fx,fy,fz,ux,uy,uz\n"
        "0,5,1.5707963,0,-1,0,0,0,0,1\n"
        "1,5,1.5707963,0.1,-1,0,0,0,0,1\n")
    f = tmp_path / "all.toml"
    f.write_text(
        "[camera]\nresolution_x = 24\nresolution_y = 16\n"
        "diagonal = 43.0\nfocal_length = 15.0\n"
        "[simulation]\nescape_radius = 20.0\n"
        "ray_integration_max_itarations = 3000\n"    # reference typo
        "[metric]\nm = 0.2\na = 0.001\nrho = 2.0\n"  # sniffed interstellar
        "[video]\nvideo_name = \"clip\"\n"
        "filepath_to_camera_path = \"orbit.csv\"\n")
    s = load_settings(f)
    assert (s.camera.resolution_x, s.camera.resolution_y) == (24, 16)
    assert s.simulation.ray_integration_max_iterations == 3000
    assert s.simulation.ray_integration_step == 0.05      # default kept
    assert s.metric.kind == "interstellar" and s.metric.m == 0.2
    assert s.video.filepath_to_camera_path == str(tmp_path / "orbit.csv")
    assert s.image.image_name == "output_image"           # whole default

    # empty path -> all defaults
    d = load_settings(None)
    assert d.camera.resolution_x == 960 and d.metric.kind == "ellis"

    # unknown section is an error, not a silent ignore
    g = tmp_path / "bad.toml"
    g.write_text("[cam]\nresolution_x = 8\n")
    with pytest.raises(SettingsError, match="unknown settings section"):
        load_settings(g)

    # section values are validated like the per-file loaders
    h = tmp_path / "badval.toml"
    h.write_text("[camera]\nresolution_x = 0\n")
    with pytest.raises(SettingsError):
        load_settings(h)


def test_settings_validation():
    with pytest.raises(SettingsError):
        CameraSettings(resolution_x=0).validate()
    with pytest.raises(SettingsError):
        SimulationSettings(escape_radius=-1.0).validate()
    with pytest.raises(SettingsError):
        ImageSettings(image_name="").validate()
    with pytest.raises(SettingsError):
        MetricSettings(kind="nope").validate()


def test_video_frames_resume(tmp_path, rng):
    """Video pipeline renders frames, skips existing on resume."""
    import jax.numpy as jnp
    import curvis_tpu as cv
    from curvis_tpu.render.video import render_video_frames
    metric = cv.make_metric("ellis", rho=1.0)
    bg = cv.make_spherical_image(rng.random((16, 32, 3)), dtype=jnp.float64)
    path = generate_orbit_path(l=3.0, period=0.2, n=10)
    frames = render_video_frames(
        metric, path, bg, bg, tmp_path, frame_rate=30.0, resolution=(32, 18),
        dt=0.05, max_steps=20_000, escape_radius=50.0, renderer="symmetric",
        alpha_nums=40, max_iterations_sampling=3, dtype=jnp.float64,
        progress=False)
    assert len(frames) == 6
    assert all(f.exists() for f in frames)
    manifest = json.loads((tmp_path / "manifest.json").read_text())
    assert len(manifest["frames"]) == 6
    # resume: delete one frame, re-run; only that one re-renders
    frames[2].unlink()
    mtime = frames[0].stat().st_mtime_ns
    render_video_frames(
        metric, path, bg, bg, tmp_path, frame_rate=30.0, resolution=(32, 18),
        dt=0.05, max_steps=20_000, escape_radius=50.0, renderer="symmetric",
        alpha_nums=40, max_iterations_sampling=3, dtype=jnp.float64,
        progress=False)
    assert frames[2].exists()
    assert frames[0].stat().st_mtime_ns == mtime


def test_video_frames_device_batched(tmp_path, rng):
    """Direct renderer with frames_per_batch>1 produces the same frames as
    one-by-one rendering."""
    import jax.numpy as jnp
    import curvis_tpu as cv
    from curvis_tpu.render.video import render_video_frames
    metric = cv.make_metric("ellis", rho=1.0)
    bg = cv.make_spherical_image(rng.random((16, 32, 3)), dtype=jnp.float64)
    path = generate_orbit_path(l=3.0, period=0.2, n=10)
    kw = dict(frame_rate=30.0, resolution=(24, 14), dt=0.05,
              max_steps=20_000, escape_radius=50.0, renderer="direct",
              dtype=jnp.float64, progress=False)
    a = render_video_frames(metric, path, bg, bg, tmp_path / "a", **kw)
    b = render_video_frames(metric, path, bg, bg, tmp_path / "b",
                            frames_per_batch=4, **kw)
    assert len(a) == len(b) == 6
    from PIL import Image
    for fa, fb in zip(a, b):
        ia = np.asarray(Image.open(fa)).astype(int)
        ib = np.asarray(Image.open(fb)).astype(int)
        assert ia.shape == ib.shape == (14, 24, 3)
        # the batched path runs jitted (fused) math; ulp differences flip
        # nearest texels for the chaotic throat-crossing pixels only
        mismatch = (np.abs(ia - ib).max(-1) > 0).mean()
        assert mismatch < 0.05, mismatch


def test_video_frames_symmetric_batched(tmp_path, rng):
    """Symmetric renderer with frames_per_batch>1 produces the same frames
    as one-by-one rendering (lock-step on-device refinement per batch)."""
    import jax.numpy as jnp
    import curvis_tpu as cv
    from curvis_tpu.render.video import render_video_frames
    metric = cv.make_metric("ellis", rho=1.0)
    bg = cv.make_spherical_image(rng.random((16, 32, 3)), dtype=jnp.float64)
    path = generate_orbit_path(l=3.0, period=0.2, n=10)
    kw = dict(frame_rate=30.0, resolution=(24, 14), dt=0.05,
              max_steps=20_000, escape_radius=50.0, renderer="symmetric",
              alpha_nums=40, max_iterations_sampling=8,
              dtype=jnp.float64, progress=False)
    a = render_video_frames(metric, path, bg, bg, tmp_path / "a", **kw)
    b = render_video_frames(metric, path, bg, bg, tmp_path / "b",
                            frames_per_batch=4, **kw)
    assert len(a) == len(b) == 6
    from PIL import Image
    for fa, fb in zip(a, b):
        ia = np.asarray(Image.open(fa)).astype(int)
        ib = np.asarray(Image.open(fb)).astype(int)
        assert ia.shape == ib.shape == (14, 24, 3)
        # one-by-one uses sampler='auto' while the batch runs the lock-step
        # device sampler; both refine to the same grid, so only ulp-level
        # texel flips on chaotic throat-crossing pixels may differ
        mismatch = (np.abs(ia - ib).max(-1) > 0).mean()
        assert mismatch < 0.05, mismatch


def test_video_frames_kerr_batched(tmp_path, rng):
    """Kerr video mode (renderer='kerr'): frames_per_batch>1 produces the
    same frames as one-by-one rendering (no symmetry reduction to use)."""
    import jax.numpy as jnp
    import curvis_tpu as cv
    from curvis_tpu.metrics.kerr import make_kerr
    from curvis_tpu.render.video import render_video_frames
    metric = make_kerr(m=1.0, a=0.9)
    bg = cv.make_spherical_image(0.5 + 0.5 * rng.random((16, 32, 3)),
                                 dtype=jnp.float64)
    path = generate_orbit_path(l=28.0, period=0.2, n=10)
    kw = dict(frame_rate=30.0, resolution=(20, 12), dt=0.25, max_steps=2000,
              escape_radius=64.0, renderer="kerr", dtype=jnp.float64,
              progress=False)
    a = render_video_frames(metric, path, bg, bg, tmp_path / "a", **kw)
    b = render_video_frames(metric, path, bg, bg, tmp_path / "b",
                            frames_per_batch=3, **kw)
    assert len(a) == len(b) == 6
    from PIL import Image
    for fa, fb in zip(a, b):
        ia = np.asarray(Image.open(fa)).astype(int)
        ib = np.asarray(Image.open(fb)).astype(int)
        assert ia.shape == ib.shape == (12, 20, 3)
        # escape_radius is shared across the batch (max-radius rule) and both
        # paths pass the same explicit value here; only ulp-level texel flips
        # near the shadow edge may differ
        mismatch = (np.abs(ia - ib).max(-1) > 0).mean()
        assert mismatch < 0.05, mismatch


def test_metric_settings_kerr(tmp_path):
    f = tmp_path / "kerr.toml"
    f.write_text('kind = "kerr"\nm = 1.0\na = 0.7\n')
    m = MetricSettings.from_toml(f)
    from curvis_tpu.metrics.kerr import KerrMetric
    assert isinstance(m.make(), KerrMetric)
    f2 = tmp_path / "bad.toml"
    f2.write_text('kind = "kerr"\nm = 1.0\na = 1.5\n')
    with pytest.raises(SettingsError):
        MetricSettings.from_toml(f2)


def test_video_frames_kerr_starlight(tmp_path, rng):
    """Kerr video with a STARLIT disk (round-5 late session): the
    camera-independent BL illumination map is hoisted once per clip in
    BOTH video paths (one-by-one and frames_per_batch>1) — previously the
    kerr video branches passed no map and raised."""
    import jax.numpy as jnp
    import curvis_tpu as cv
    from curvis_tpu.metrics.kerr import make_kerr
    from curvis_tpu.render.disk import DiskParams
    from curvis_tpu.render.video import render_video_frames
    metric = make_kerr(m=1.0, a=0.7)
    bg = cv.make_spherical_image(0.5 + 0.5 * rng.random((16, 32, 3)),
                                 dtype=jnp.float64)
    disk = DiskParams(r_inner=3.0, r_outer=9.0, starlight=True,
                      starlight_grid=(6, 8), starlight_samples=8,
                      brightness=0.3)
    path = generate_orbit_path(l=20.0, period=0.2, n=10)
    kw = dict(frame_rate=15.0, resolution=(20, 12), dt=0.25, max_steps=1500,
              escape_radius=48.0, renderer="kerr", disk=disk,
              dtype=jnp.float64, progress=False)
    a = render_video_frames(metric, path, bg, bg, tmp_path / "a", **kw)
    b = render_video_frames(metric, path, bg, bg, tmp_path / "b",
                            frames_per_batch=2, **kw)
    assert len(a) == len(b) == 3
    from PIL import Image
    for fa, fb in zip(a, b):
        ia = np.asarray(Image.open(fa)).astype(int)
        ib = np.asarray(Image.open(fb)).astype(int)
        assert np.isfinite(ia).all()
        mismatch = (np.abs(ia - ib).max(-1) > 0).mean()
        assert mismatch < 0.05, mismatch
