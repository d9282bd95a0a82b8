// Reference-cost proxy: single-threaded f64 CPU ray march replicating the
// CurVis reference's inner loop (Rust is not available in this image, so the
// reference cannot be compiled; this C++ port of its per-step math, built with
// -O3, stands in as the measured baseline for BASELINE.md / bench.py).
//
// Replicates, in f64 scalar code like the Rust original:
//   - update_relativistic_object (metrics.rs:283-297): full 4-position /
//     4-momentum Euler step with the trig-bearing general RHS
//     (metrics.rs:223-270)
//   - escape_photon loop (systems.rs:115-139): step until |l| > R or 40k iters
//   - camera ray generation (cameras.rs:150-172) for the default 960x540-
//     style optics at the requested resolution, camera at l=5 facing -x
//   - photon spawn new_photon (metrics.rs:301-334)
//
// Usage: refbench [res=256] [subsample=1]
// Prints rays/s and steps/s for an Ellis rho=1 render at res x res.

#include <cmath>
#include <cstdio>
#include <cstdint>
#include <cstdlib>
#include <chrono>

struct Ellis {
  double rho2;
  inline double r2(double l) const { return rho2 + l * l; }
  inline double r(double l) const { return std::sqrt(rho2 + l * l); }
  inline double dr(double l) const { return l / r(l); }
};

struct Photon {
  double x[4];  // t, l, theta, phi (contravariant)
  double p[4];  // covariant
};

// One forward-Euler step of the full 3-D system (metrics.rs:283-297).
static inline void step(const Ellis& m, Photon& ph, double dt) {
  const double l = ph.x[1], th = ph.x[2];
  const double r2 = m.r2(l);
  const double r = std::sqrt(r2);
  const double s = std::sin(th), c = std::cos(th);
  const double s2 = s * s;
  // position diff (contravariant) = g^ii p_i
  const double dx0 = -ph.p[0];
  const double dx1 = ph.p[1];
  const double dx2 = ph.p[2] / r2;
  const double dx3 = ph.p[3] / (r2 * s2);
  // momentum diff (covariant)
  const double b2 = ph.p[2] * ph.p[2] + ph.p[3] * ph.p[3] / s2;
  const double dp1 = b2 * m.dr(l) / (r * r * r);
  const double dp2 = ph.p[3] * ph.p[3] * c / (r2 * s2 * s);
  ph.x[0] += dt * dx0; ph.x[1] += dt * dx1;
  ph.x[2] += dt * dx2; ph.x[3] += dt * dx3;
  ph.p[1] += dt * dp1; ph.p[2] += dt * dp2;
}

int main(int argc, char** argv) {
  const int res = argc > 1 ? std::atoi(argv[1]) : 256;
  const int sub = argc > 2 ? std::atoi(argv[2]) : 1;
  const Ellis metric{1.0};
  const double dt = 0.05, R = 100.0;
  const int max_iter = 40000;
  const double l0 = 5.0, th0 = M_PI / 2.0, ph0 = 0.0;

  // Camera optics (settings/defaults/camera_settings.toml): diag 43, f 15.
  const double aspect = 1.0;
  const double sensor_h = std::sqrt(43.0 * 43.0 / (aspect * aspect + 1.0));
  const double sensor_w = aspect * sensor_h;
  const double f = 15.0;

  std::uint64_t total_steps = 0, rays = 0, pos = 0, neg = 0, stuck = 0;
  auto t0 = std::chrono::steady_clock::now();
  for (int i = 0; i < res; i += sub) {
    for (int j = 0; j < res; j += sub) {
      // camera-space ray (cameras.rs:150-164), forward = -x world via the
      // camera rotation; tangent components fed to new_photon like the
      // reference naive path.
      const double w = (double)i / res - 0.5;
      const double h = 0.5 - (double)j / res;
      double vx = f, vy = -sensor_w * w, vz = sensor_h * h;
      const double n = std::sqrt(vx * vx + vy * vy + vz * vz);
      vx /= n; vy /= n; vz /= n;
      // rotate camera->world for forward=-x, up=+z: x->-x, y->-y, z->z
      const double dx = -vx, dy = -vy, dz = vz;
      // new_photon (metrics.rs:322-333)
      const double r0 = metric.r(l0);
      Photon ph{{0.0, l0, th0, ph0},
                {1.0, dx, dy * r0, dz * r0 * std::sin(th0)}};
      int it = 0;
      for (; it < max_iter; ++it) {
        step(metric, ph, dt);
        if (ph.x[1] > R) { ++pos; break; }
        if (ph.x[1] < -R) { ++neg; break; }
      }
      if (it == max_iter) ++stuck;
      total_steps += (std::uint64_t)(it < max_iter ? it + 1 : max_iter);
      ++rays;
    }
  }
  auto t1 = std::chrono::steady_clock::now();
  const double secs = std::chrono::duration<double>(t1 - t0).count();
  std::printf(
      "{\"rays\": %llu, \"steps\": %llu, \"secs\": %.3f, "
      "\"rays_per_s\": %.1f, \"msteps_per_s\": %.2f, "
      "\"pos\": %llu, \"neg\": %llu, \"stuck\": %llu}\n",
      (unsigned long long)rays, (unsigned long long)total_steps, secs,
      rays / secs, total_steps / secs / 1e6, (unsigned long long)pos,
      (unsigned long long)neg, (unsigned long long)stuck);
  return 0;
}
