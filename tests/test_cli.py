"""End-to-end CLI invocations (cli.py) — the reference command surface
(cli.rs:3-25) driven through ``main(argv)`` with tiny scenes: PNG in,
settings TOMLs on disk, PNG out.  Runs CPU f64 (--f64) for determinism."""
import numpy as np
import pytest
from PIL import Image

from curvis_tpu.cli import main


@pytest.fixture()
def scene(tmp_path, rng):
    """Two tiny equirect backgrounds + small-render settings TOMLs."""
    for name in ("bg1.png", "bg2.png"):
        arr = (rng.random((16, 32, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / name)
    (tmp_path / "cam.toml").write_text(
        "resolution_x = 24\nresolution_y = 16\n"
        "diagonal = 43.0\nfocal_length = 15.0\n")
    (tmp_path / "sim.toml").write_text(
        "escape_radius = 20.0\nray_integration_max_iterations = 3000\n"
        "ray_integration_step = 0.05\nsampling_initial_nums = 40\n"
        "sampling_max_iterations = 10\n"
        "sampling_convergence_threshold_1 = 1e-4\n"
        "sampling_convergence_threshold_2 = 1e-4\n")
    return tmp_path


def _image_args(d, metric_toml, *extra):
    (d / "metric.toml").write_text(metric_toml)
    return ["image", str(d / "bg1.png"), str(d / "bg2.png"), str(d / "out"),
            "-m", str(d / "metric.toml"), "-c", str(d / "cam.toml"),
            "-s", str(d / "sim.toml"), "--f64", *extra]


def _out_image(d):
    p = d / "out" / "output_image.png"
    assert p.exists()
    img = np.asarray(Image.open(p), dtype=np.float64) / 255.0
    assert img.shape == (16, 24, 3)
    return img


def test_cli_image_ellis_direct(scene):
    assert main(_image_args(scene, "rho = 1.0\n", "--renderer", "direct",
                            "--filtering", "bilinear")) == 0
    img = _out_image(scene)
    assert (img.sum(-1) > 0).mean() > 0.9         # wormhole view: no shadow


def test_cli_image_single_settings_file(scene):
    """--settings ONE.toml drives every category at once (the reference's
    wishlist item, README.md:117); a per-category flag still overrides."""
    (scene / "all.toml").write_text(
        "[camera]\nresolution_x = 24\nresolution_y = 16\n"
        "[simulation]\nescape_radius = 20.0\n"
        "ray_integration_max_iterations = 3000\n"
        "[metric]\nrho = 1.0\n"
        "[image]\nimage_name = \"one_file\"\n")
    args = ["image", str(scene / "bg1.png"), str(scene / "bg2.png"),
            str(scene / "out"), "--settings", str(scene / "all.toml"),
            "--renderer", "direct", "--f64"]
    assert main(args) == 0
    p = scene / "out" / "one_file.png"
    assert p.exists()
    img = np.asarray(Image.open(p), dtype=np.float64) / 255.0
    assert img.shape == (16, 24, 3)
    assert (img.sum(-1) > 0).mean() > 0.9

    # -m overrides the [metric] section but keeps the rest of the file
    (scene / "m2.toml").write_text("rho = 2.0\n")
    assert main(args + ["-m", str(scene / "m2.toml")]) == 0
    img2 = np.asarray(Image.open(p), dtype=np.float64) / 255.0
    assert (img2 != img).any()          # different throat -> different image


def test_cli_image_symmetric_default(scene):
    assert main(_image_args(scene, 'kind = "ellis"\nrho = 1.0\n')) == 0
    _out_image(scene)


def test_cli_image_kerr_newman_disk(scene):
    """Charged+rotating metric routed through the BL renderer with a
    volumetric blackbody disk — the full new-family CLI chain."""
    args = _image_args(
        scene, 'kind = "kerr-newman"\nm = 1.0\na = 0.7\nq = 0.4\n',
        "--disk", "--disk-volumetric", "--disk-color", "blackbody")
    assert main(args) == 0
    img = _out_image(scene)
    assert np.isfinite(img).all()
    assert img.max() > 0.05                       # disk/background visible


def test_cli_image_disk_starlight(scene):
    """Thin disk with starlight reflection (--disk-starlight) through the
    planar disk renderer."""
    args = _image_args(
        scene, 'kind = "schwarzschild"\nm = 1.0\n',
        "--disk", "--disk-starlight", "--disk-albedo", "0.6", "0.6", "0.6")
    assert main(args) == 0
    img = _out_image(scene)
    assert np.isfinite(img).all()
    assert img.max() > 0.05


def test_cli_image_rn_shadow(scene):
    """Reissner-Nordstrom through the planar direct renderer: central
    shadow pixels are black, surroundings lit."""
    (scene / "img.toml").write_text(
        'image_name = "output_image"\nt = 0.0\nl = 20.0\n'
        "theta = 1.5707963267948966\nphi = 0.0\n"
        "forward_x = -1.0\nforward_y = 0.0\nforward_z = 0.0\n"
        "up_x = 0.0\nup_y = 0.0\nup_z = 1.0\n")
    args = _image_args(scene, 'kind = "rn"\nm = 1.0\nq = 0.6\n',
                       "--renderer", "direct",
                       "-i", str(scene / "img.toml"))
    assert main(args) == 0
    img = _out_image(scene)
    black = img.sum(-1) == 0
    assert black[8, 12]                           # shadow at center
    assert not black[8, 1]


def test_cli_video_two_frames(scene):
    """Video mode end-to-end: camera-path CSV -> two frame PNGs, device-
    batched (--frames-per-batch 2), resumable output directory."""
    from curvis_tpu.camera.path import generate_orbit_path, save_path
    (scene / "metric.toml").write_text("rho = 1.0\n")
    save_path(generate_orbit_path(l=5.0, period=2.0, n=20),
              scene / "orbit.csv")
    (scene / "video.toml").write_text(
        'video_name = "vid"\nframe_rate = 1.0\n'
        f'filepath_to_camera_path = "{scene / "orbit.csv"}"\n')
    args = ["video", str(scene / "bg1.png"), str(scene / "bg2.png"),
            str(scene / "vout"), "-m", str(scene / "metric.toml"),
            "-c", str(scene / "cam.toml"), "-s", str(scene / "sim.toml"),
            "-v", str(scene / "video.toml"), "--renderer", "direct",
            "--frames-per-batch", "2", "--f64"]
    assert main(args) == 0
    frames = sorted((scene / "vout" / "tmp").glob("*.png"))
    assert len(frames) == 2
    img = np.asarray(Image.open(frames[0]))
    assert img.shape == (16, 24, 3)


def test_cli_video_disk_starlight_hoists_map(scene, monkeypatch):
    """--disk-starlight through the VIDEO CLI (VERDICT round-4 #7): the
    camera-independent starlight map is computed ONCE for the whole clip
    (not per batch), and the starlit frames render."""
    from curvis_tpu.camera.path import generate_orbit_path, save_path
    from curvis_tpu.render import disk as disk_mod
    (scene / "metric.toml").write_text('kind = "schwarzschild"\nm = 1.0\n')
    save_path(generate_orbit_path(l=20.0, period=4.0, n=20),
              scene / "orbit.csv")
    (scene / "video.toml").write_text(
        'video_name = "vid"\nframe_rate = 1.0\n'
        f'filepath_to_camera_path = "{scene / "orbit.csv"}"\n')
    calls = {"n": 0}
    state = {"in_hoist": False}
    real = disk_mod.compute_starlight_map
    real_impl = disk_mod._starlight_map_impl

    def counting(*a, **k):
        calls["n"] += 1
        state["in_hoist"] = True
        try:
            return real(*a, **k)
        finally:
            state["in_hoist"] = False

    def guarded_impl(*a, **k):
        # the impl may only run under the once-per-clip hoist; a call from
        # inside the renderer means the map was recomputed per batch
        if not state["in_hoist"]:
            raise AssertionError("renderer recomputed the starlight map "
                                 "instead of using the hoisted one")
        return real_impl(*a, **k)

    monkeypatch.setattr(disk_mod, "compute_starlight_map", counting)
    monkeypatch.setattr(disk_mod, "_starlight_map_impl", guarded_impl)
    args = ["video", str(scene / "bg1.png"), str(scene / "bg2.png"),
            str(scene / "vout"), "-m", str(scene / "metric.toml"),
            "-c", str(scene / "cam.toml"), "-s", str(scene / "sim.toml"),
            "-v", str(scene / "video.toml"), "--disk", "--disk-starlight",
            "--frames-per-batch", "2", "--f64"]
    assert main(args) == 0
    frames = sorted((scene / "vout" / "tmp").glob("*.png"))
    assert len(frames) == 4               # 4 frames in 2 batches...
    assert calls["n"] == 1                # ...but ONE map compute
    img = np.asarray(Image.open(frames[0]))
    assert img.shape == (16, 24, 3)


def test_cli_image_adaptive_aa(scene):
    """--adaptive-aa routes through the edge-adaptive supersampler."""
    assert main(_image_args(scene, "rho = 1.0\n", "--renderer", "direct",
                            "--filtering", "bilinear",
                            "--adaptive-aa", "0.1")) == 0
    _out_image(scene)


def test_cli_image_camera_velocity(scene):
    """--camera-velocity routes aberration through both renderer families."""
    assert main(_image_args(scene, "rho = 1.0\n", "--renderer", "direct",
                            "--filtering", "bilinear",
                            "--camera-velocity", "0.3", "0", "0")) == 0
    img_w = _out_image(scene)
    assert np.isfinite(img_w).all()
    args = _image_args(scene, 'kind = "kerr"\nm = 1.0\na = 0.8\n',
                       "--camera-velocity", "0", "0.3", "0")
    assert main(args) == 0
    _out_image(scene)


def test_cli_image_kerr_rk45_stepper(scene):
    """--stepper rk45 reaches the BL renderer (error-controlled DP5(4)
    march instead of fixed RK4): finite image with a visible shadow."""
    args = _image_args(scene, 'kind = "kerr"\nm = 1.0\na = 0.8\n',
                       "--stepper", "rk45")
    assert main(args) == 0
    img = _out_image(scene)
    assert np.isfinite(img).all()
    assert (img.sum(-1) < 0.05).mean() > 0.01     # shadow present
    # wide-FOV close camera: ~78% shadow here (identical to the rk4
    # stepper's fraction on this scene), background on the remainder
    assert (img.sum(-1) > 0.1).mean() > 0.15


def test_cli_image_kerr_starlight(scene):
    """Kerr with a starlit disk from the CLI: the camera-independent BL
    illumination map is computed once inside the CLI (round-5 late
    session — previously this raised 'needs a precomputed map'), for the
    thin-disk reflection AND the volumetric in-gas scattering."""
    args = _image_args(
        scene, 'kind = "kerr"\nm = 1.0\na = 0.7\n',
        "--disk", "--disk-starlight", "--disk-albedo", "0.6", "0.6", "0.6")
    assert main(args) == 0
    img = _out_image(scene)
    assert np.isfinite(img).all()
    args = _image_args(
        scene, 'kind = "kerr"\nm = 1.0\na = 0.7\n',
        "--disk", "--disk-volumetric", "--disk-starlight")
    assert main(args) == 0
    img2 = _out_image(scene)
    assert np.isfinite(img2).all()
