"""Multi-host partitioning + tiled rendering with resume (single-process
degenerate case exercises the full logic)."""
import numpy as np
import pytest
import jax.numpy as jnp

import curvis_tpu as cv
from curvis_tpu.metrics.base import EllisMetric
from curvis_tpu.parallel.distributed import (assemble_tiles, bands_for_host,
                                             partition_rows, render_tiled)

KW = dict(dt=0.05, max_steps=20_000, escape_radius=50.0)


def test_partition_rows():
    bands = partition_rows(100, 8)
    assert bands[0][0] == 0 and bands[-1][1] == 100
    # contiguous, non-overlapping
    for (a0, a1), (b0, b1) in zip(bands[:-1], bands[1:]):
        assert a1 == b0
    # host assignment covers everything exactly once across hosts
    all_assigned = sum((bands_for_host(bands, h, 3) for h in range(3)), [])
    assert sorted(all_assigned) == bands


def test_tiled_render_matches_full(tmp_path, rng):
    metric = EllisMetric(rho=jnp.asarray(1.0))
    cam = cv.make_camera([0.0, 5.0, np.pi / 2, 0.0], [-1.0, 0.2, 0.1],
                         [0.0, 0.0, 1.0], 15.0, 43.0, 40, 24,
                         dtype=jnp.float64)
    bg = cv.make_spherical_image(rng.random((16, 32, 3)), dtype=jnp.float64)
    full = np.asarray(cv.render_direct(metric, cam, bg, bg, method="planar",
                                       filtering="nearest", **KW))
    tiles = render_tiled(metric, cam, bg, bg, tmp_path, bands=None,
                         host_id=0, n_hosts=1, **KW)
    assert len(tiles) >= 8
    img = assemble_tiles(tmp_path, 40, 24)
    # band rendering is the same math; only jit/fusion ulps can differ
    mismatch = (np.abs(img - full).max(-1) > 1e-6).mean()
    assert mismatch < 0.05


def test_tiled_render_two_hosts_combine(tmp_path, rng):
    metric = EllisMetric(rho=jnp.asarray(1.0))
    cam = cv.make_camera([0.0, 5.0, np.pi / 2, 0.0], [1.0, 0.4, 0.2],
                         [0.0, 0.0, 1.0], 15.0, 43.0, 32, 20,
                         dtype=jnp.float64)
    bg = cv.make_spherical_image(rng.random((16, 32, 3)), dtype=jnp.float64)
    bands = partition_rows(20, 4)
    # "two hosts" render their own bands into the same folder
    render_tiled(metric, cam, bg, bg, tmp_path, bands=bands, host_id=0,
                 n_hosts=2, **KW)
    with pytest.raises(RuntimeError):
        assemble_tiles(tmp_path, 32, 20)          # host 1's rows missing
    render_tiled(metric, cam, bg, bg, tmp_path, bands=bands, host_id=1,
                 n_hosts=2, **KW)
    img = assemble_tiles(tmp_path, 32, 20)
    assert img.shape == (20, 32, 3)
    assert (img.sum(-1) > 0).all()                # outward camera: all lit


def test_tiled_render_resume(tmp_path, rng):
    metric = EllisMetric(rho=jnp.asarray(1.0))
    cam = cv.make_camera([0.0, 5.0, np.pi / 2, 0.0], [1.0, 0.3, 0.1],
                         [0.0, 0.0, 1.0], 15.0, 43.0, 16, 16,
                         dtype=jnp.float64)
    bg = cv.make_spherical_image(rng.random((8, 16, 3)), dtype=jnp.float64)
    tiles = render_tiled(metric, cam, bg, bg, tmp_path, host_id=0, n_hosts=1,
                         **KW)
    mtime = tiles[0].stat().st_mtime_ns
    tiles[1].unlink()
    render_tiled(metric, cam, bg, bg, tmp_path, host_id=0, n_hosts=1, **KW)
    assert tiles[1].exists()
    assert tiles[0].stat().st_mtime_ns == mtime   # untouched on resume
