"""C++ runtime library: CSV loader, f64 oracle march, sampling driver."""
import numpy as np
import pytest

from curvis_tpu import native
from curvis_tpu.camera.path import generate_orbit_path, save_path, load_path


requires_native = pytest.mark.skipif(not native.available(),
                                     reason="native library not built")


@requires_native
def test_native_csv_loader_matches_python(tmp_path):
    p = generate_orbit_path(n=64)
    f = tmp_path / "p.csv"
    save_path(p, f)
    pos, fwd, up = native.load_path_native(f)
    ref = load_path(f)
    np.testing.assert_allclose(pos, ref.positions, rtol=1e-15)
    np.testing.assert_allclose(fwd, ref.forwards, rtol=1e-15)
    np.testing.assert_allclose(up, ref.ups, rtol=1e-15)
    # reference-shipped CSV too, if mounted
    import os
    if os.path.exists("/root/reference/paths/path_through.csv"):
        pos, fwd, up = native.load_path_native(
            "/root/reference/paths/path_through.csv")
        assert pos.shape == (1000, 4)


@requires_native
def test_native_march_matches_jax_f64():
    """The C++ oracle march is step-for-step the same Euler recurrence."""
    import jax.numpy as jnp
    from curvis_tpu.metrics.base import EllisMetric
    from curvis_tpu.physics import planar as pl
    alphas = np.linspace(0.1, 3.0, 40)
    l = np.full(40, 5.0)
    psi = np.zeros(40)
    p_l = np.cos(alphas)
    b = np.sin(alphas) * np.sqrt(26.0)
    ln, pn, pln, sn, stn = native.march_planar_f64(
        "ellis", (1.0,), l, psi, p_l, b, dt=0.05, max_steps=40_000,
        escape_radius=100.0)
    metric = EllisMetric(rho=jnp.asarray(1.0))
    rays = pl.PlanarRays(jnp.asarray(l), jnp.asarray(psi), jnp.asarray(p_l),
                         jnp.asarray(b), jnp.zeros((1, 3)), jnp.zeros((1, 3)))
    res = pl.march_planar_while(metric, rays, dt=0.05, max_steps=40_000,
                                escape_radius=100.0)
    np.testing.assert_array_equal(sn, np.asarray(res.sign))
    np.testing.assert_array_equal(stn, np.asarray(res.steps))
    np.testing.assert_allclose(ln, np.asarray(res.l), rtol=1e-14)
    np.testing.assert_allclose(pn, np.asarray(res.psi), rtol=1e-12)


@requires_native
def test_native_march_dneg():
    ln, pn, pln, sn, stn = native.march_planar_f64(
        "interstellar", (0.1, 1e-4, 1.0), [5.0], [0.0], [-1.0], [0.0],
        dt=0.05, max_steps=40_000, escape_radius=100.0)
    assert sn[0] == -1            # radial inward ray crosses the throat


@requires_native
def test_native_sampler_matches_python():
    from curvis_tpu.sampling.adaptive import doubly_sample_function

    def batch(alphas):
        # synthetic deflection-like function with a sharp feature
        e = np.arctan(20 * (alphas - 1.0)) + alphas
        s = np.where(alphas < 1.0, 1.0, -1.0)
        return e, s

    args = (0.0, 3.0, 30, 10, 1e-3, 1e-3, batch)
    a1, e1, s1 = doubly_sample_function(*args)
    a2, e2, s2 = native.doubly_sample_native(*args)
    np.testing.assert_allclose(a1, a2, rtol=1e-15)
    np.testing.assert_allclose(e1, e2, rtol=1e-15)
    np.testing.assert_allclose(s1, s2, rtol=1e-15)
