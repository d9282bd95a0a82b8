// curvis_native — C++ runtime components of the curvis_tpu framework.
//
// The TPU compute path is JAX/XLA/Pallas; this library provides the native
// host-runtime pieces around it (the role the reference's Rust plays outside
// the inner math):
//
//   cn_load_path        camera-path CSV loader (csv.rs:24-61 schema)
//   cn_march_planar_f64 double-precision CPU planar march — the golden
//                       oracle executor for parity gates (same escape
//                       semantics as systems.rs:115-139)
//   cn_doubly_sample    the adaptive-sampling driver loop
//                       (sampling.rs:46-124 semantics): C++ owns the
//                       refinement bookkeeping and calls back into a
//                       batched evaluator (a jitted TPU bundle on the
//                       Python side)
//
// Pure C ABI (ctypes); no Python.h.  Build: make -C native (g++ -O3 -shared).

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// CSV camera-path loader.  Schema: header line ignored, then 10
// comma-separated doubles per row (t,l,theta,phi, fx,fy,fz, ux,uy,uz).
// Two-call pattern: out == nullptr -> returns row count (or -1 on error);
// otherwise fills out[10 * cap_rows] row-major and returns rows written.
// ---------------------------------------------------------------------------
int cn_load_path(const char* path, double* out, int cap_rows) {
  FILE* f = std::fopen(path, "r");
  if (!f) return -1;
  char line[4096];
  int row = 0;
  bool first = true;
  while (std::fgets(line, sizeof line, f)) {
    if (first) { first = false; continue; }            // skip header
    // skip blank lines
    bool blank = true;
    for (char* c = line; *c; ++c)
      if (!std::isspace((unsigned char)*c)) { blank = false; break; }
    if (blank) continue;
    if (out) {
      if (row >= cap_rows) { std::fclose(f); return -2; }
      double v[10];
      char* p = line;
      for (int k = 0; k < 10; ++k) {
        char* end = nullptr;
        v[k] = std::strtod(p, &end);
        if (end == p) { std::fclose(f); return -3; }   // parse error
        p = end;
        while (*p == ',' || *p == ' ') ++p;
      }
      std::memcpy(out + 10 * row, v, sizeof v);
    }
    ++row;
  }
  std::fclose(f);
  return row;
}

// ---------------------------------------------------------------------------
// f64 planar march (CPU oracle).  kind: 0 = Ellis(rho), 1 = DNEG(m, a, rho),
// 2 = flat.  stepper: 0 = Euler (reference parity), 1 = RK4.
// State arrays are updated in place; sign/steps written out.
// ---------------------------------------------------------------------------
namespace {

struct Shape {
  int kind;
  double p0, p1, p2;
  inline double r(double l) const {
    switch (kind) {
      case 0: return std::sqrt(p0 * p0 + l * l);
      case 1: {
        const double m = p0, a = p1, rho = p2;
        const double al = std::fabs(l);
        if (al <= a) return rho;
        const double x = 2.0 * (al - a) / (M_PI * m);
        return rho + m * (x * std::atan(x) - 0.5 * std::log1p(x * x));
      }
      default: return l;
    }
  }
  inline double r2(double l) const {
    if (kind == 0) return p0 * p0 + l * l;
    const double rr = r(l);
    return rr * rr;
  }
  inline double dr(double l) const {
    switch (kind) {
      case 0: return l / std::sqrt(p0 * p0 + l * l);
      case 1: {
        const double m = p0, a = p1;
        const double al = std::fabs(l);
        if (al <= a) return 0.0;
        const double x = 2.0 * (al - a) / (M_PI * m);
        return (2.0 / M_PI) * (l > 0 ? 1.0 : -1.0) * std::atan(x);
      }
      default: return 1.0;
    }
  }
};

struct Deriv { double dl, dpsi, dpl; };

inline Deriv rhs(const Shape& s, double l, double pl, double b) {
  const double r2 = s.r2(l);
  const double r = s.r(l);
  return {pl, b / r2, b * b * s.dr(l) / (r2 * r)};
}

}  // namespace

void cn_march_planar_f64(int kind, const double* params, int n, double* l,
                         double* psi, double* pl, const double* b, double dt,
                         int max_steps, double escape_radius, int stepper,
                         int32_t* sign, int32_t* steps) {
  const Shape s{kind, params[0], params[1], params[2]};
  for (int i = 0; i < n; ++i) {
    double li = l[i], pi = psi[i], pli = pl[i];
    const double bi = b[i];
    int32_t sg = 0;
    int it = 0;
    for (; it < max_steps; ++it) {
      if (stepper == 0) {
        const Deriv d = rhs(s, li, pli, bi);
        li += dt * d.dl; pi += dt * d.dpsi; pli += dt * d.dpl;
      } else {
        const Deriv k1 = rhs(s, li, pli, bi);
        const Deriv k2 = rhs(s, li + 0.5 * dt * k1.dl, pli + 0.5 * dt * k1.dpl, bi);
        const Deriv k3 = rhs(s, li + 0.5 * dt * k2.dl, pli + 0.5 * dt * k2.dpl, bi);
        const Deriv k4 = rhs(s, li + dt * k3.dl, pli + dt * k3.dpl, bi);
        li += dt / 6.0 * (k1.dl + 2 * k2.dl + 2 * k3.dl + k4.dl);
        pi += dt / 6.0 * (k1.dpsi + 2 * k2.dpsi + 2 * k3.dpsi + k4.dpsi);
        pli += dt / 6.0 * (k1.dpl + 2 * k2.dpl + 2 * k3.dpl + k4.dpl);
      }
      if (li > escape_radius) { sg = 1; ++it; break; }
      if (li < -escape_radius) { sg = -1; ++it; break; }
    }
    l[i] = li; psi[i] = pi; pl[i] = pli;
    sign[i] = sg;
    steps[i] = it;
  }
}

// ---------------------------------------------------------------------------
// Adaptive sampling driver (sampling.rs:46-124 semantics, quirks included).
// The evaluator callback receives a batch of alphas and writes escapes/signs;
// on the Python side it is a jitted TPU bundle.
// ---------------------------------------------------------------------------
typedef void (*cn_eval_fn)(const double* alphas, int n, double* out_e,
                           double* out_s, void* ctx);

namespace {

struct BiPoint { double a, e, s; };

inline bool finite3(const BiPoint& p) {
  return std::isfinite(p.a) && std::isfinite(p.e) && std::isfinite(p.s);
}

std::vector<BiPoint> clean(const std::vector<BiPoint>& v) {
  std::vector<BiPoint> out;
  out.reserve(v.size());
  for (const auto& p : v) if (finite3(p)) out.push_back(p);
  return out;
}

inline void scores(const BiPoint& p1, const BiPoint& p2, const BiPoint& p3,
                   double* s1, double* s2) {
  *s1 = std::fabs((p1.a * p2.e + p2.a * p3.e + p3.a * p1.e) -
                  (p1.e * p2.a + p2.e * p3.a + p3.e * p1.a));
  *s2 = std::fabs((p1.a * p2.s + p2.a * p3.s + p3.a * p1.s) -
                  (p1.s * p2.a + p2.s * p3.a + p3.s * p1.a));
}

}  // namespace

// Returns number of points written to out (a*3 layout: a, e, s per row), or
// -1 if the output capacity was exceeded, -2 if a pass had < 3 points.
int cn_doubly_sample(double a_min, double a_max, int n0, int max_iter,
                     double thr1, double thr2, cn_eval_fn eval, void* ctx,
                     double* out, int cap) {
  std::vector<double> xs(n0);
  const double step = (a_max - a_min) / (n0 - 1);
  for (int i = 0; i < n0; ++i) xs[i] = a_min + i * step;
  std::vector<double> es(n0), ss(n0);
  eval(xs.data(), n0, es.data(), ss.data(), ctx);
  std::vector<BiPoint> pts;
  for (int i = 0; i < n0; ++i) pts.push_back({xs[i], es[i], ss[i]});
  pts = clean(pts);

  int iter = 0;
  while (iter < max_iter) {
    const size_t prev = pts.size();
    // one refine pass (sampling.rs:144-195)
    pts = clean(pts);
    if (pts.size() < 3) return -2;
    struct Op { bool refine; size_t i; };
    std::vector<Op> plan;
    std::vector<double> mids;
    size_t i = 0;
    while (i + 2 < pts.size()) {
      double s1, s2;
      scores(pts[i], pts[i + 1], pts[i + 2], &s1, &s2);
      if (!(s1 > thr1 || s2 > thr2)) {
        plan.push_back({false, i});
        i += 1;
      } else {
        plan.push_back({true, i});
        mids.push_back(0.5 * (pts[i].a + pts[i + 1].a));
        mids.push_back(0.5 * (pts[i + 1].a + pts[i + 2].a));
        i += 2;
      }
    }
    std::vector<double> me(mids.size()), ms(mids.size());
    if (!mids.empty())
      eval(mids.data(), (int)mids.size(), me.data(), ms.data(), ctx);
    std::vector<BiPoint> next;
    size_t k = 0;
    for (const Op& op : plan) {
      if (!op.refine) {
        next.push_back(pts[op.i]);
      } else {
        next.push_back(pts[op.i]);
        next.push_back({mids[k], me[k], ms[k]});
        next.push_back(pts[op.i + 1]);
        next.push_back({mids[k + 1], me[k + 1], ms[k + 1]});
        k += 2;
      }
    }
    pts = clean(next);

    if (pts.size() < prev) break;          // sampling.rs:98-103
    if (pts.size() == prev) break;
    ++iter;
  }
  if (iter == max_iter)
    std::fprintf(stdout,
                 "Warning: maximum number of iterations (%d) reached in "
                 "sampling algorithm.\n", max_iter);

  if ((int)pts.size() > cap) return -1;
  for (size_t j = 0; j < pts.size(); ++j) {
    out[3 * j] = pts[j].a;
    out[3 * j + 1] = pts[j].e;
    out[3 * j + 2] = pts[j].s;
  }
  return (int)pts.size();
}

}  // extern "C"
