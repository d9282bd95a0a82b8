"""Utility modules: assembly, profiling, logging, debug."""
import numpy as np
import pytest

from curvis_tpu.utils.assemble import assemble_gif, sorted_frames
from curvis_tpu.utils.prof import StageTimer, materialize, time_fn
from curvis_tpu.utils.log import get_logger
from curvis_tpu.utils.debug import nan_checks


def test_sorted_frames_and_gif(tmp_path):
    from PIL import Image
    # deliberately out-of-order names incl. 2-digit indices
    for i in (0, 2, 10, 1):
        Image.new("RGB", (8, 6), (i * 20, 0, 0)).save(
            tmp_path / f"frame_{i}.png")
    (tmp_path / "not_a_frame.png").touch()
    frames = sorted_frames(tmp_path)
    assert [f.name for f in frames] == [
        "frame_0.png", "frame_1.png", "frame_2.png", "frame_10.png"]
    gif = assemble_gif(tmp_path, tmp_path / "out.gif", frame_rate=10)
    assert gif.exists() and gif.stat().st_size > 0
    with pytest.raises(FileNotFoundError):
        assemble_gif(tmp_path / "empty", tmp_path / "x.gif")


def test_stage_timer():
    t = StageTimer()
    t.record("march", 0.1)
    t.record("march", 0.2)
    t.record("shade", 0.05)
    s = t.summary(rays=1_000_000)
    assert abs(s["march"] - 0.3) < 1e-9
    assert abs(s["total"] - 0.35) < 1e-9
    assert s["Mrays_per_s"] > 0
    assert "march" in t.report()


def test_time_fn_and_materialize():
    import jax.numpy as jnp
    out = materialize({"a": jnp.ones(4), "b": (jnp.zeros(2), "meta")})
    assert "a" in out
    t = time_fn(lambda x: (x * 2).sum(), jnp.arange(8.0), iters=1, warmup=1)
    assert t >= 0


def test_logger_and_nan_checks():
    log = get_logger("test")
    log.info("hello")
    import jax, jax.numpy as jnp
    with nan_checks():
        assert jax.config.jax_debug_nans
        with pytest.raises(FloatingPointError):
            float(jnp.log(jnp.asarray(-1.0)))
    assert not jax.config.jax_debug_nans
