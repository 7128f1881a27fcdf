// Native host-side geometry core for the TPU GDM framework.
//
// The cut-cell quadrature generator (gdm/cut/geometry.py) reduces to many
// small polynomial root-finding problems: for every intersected cell and
// every quadrature line, find the real roots of a degree-p polynomial in
// an interval.  This is the host-side hot loop at large grids (the role
// deal.II's C++ NonMatching::QuadratureGenerator plays in the reference);
// here it is a small C++ core called through ctypes, with a pure-numpy
// fallback kept for parity testing.
//
// Root finding: Aberth–Ehrlich simultaneous iteration on the monic
// polynomial (robust for the small degrees used here, p <= 9), followed
// by a Newton polish, then filtering to the requested real interval.
//
// Build: g++ -O3 -march=native -shared -fPIC gdm_native.cpp -o libgdm_native.so

#include <cmath>
#include <complex>
#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>

namespace {

using cplx = std::complex<double>;

// Evaluate polynomial (ascending coeffs) and derivative at z.
inline void eval_poly(const double* a, int n, cplx z, cplx& p, cplx& dp) {
  p = a[n];
  dp = 0.0;
  for (int k = n - 1; k >= 0; --k) {
    dp = dp * z + p;
    p = p * z + a[k];
  }
}

// All complex roots of a degree-n polynomial with ascending coeffs.
// Returns the number of roots written (== effective degree).
int aberth_roots(const double* coeffs, int degree, cplx* roots) {
  // trim leading (high-order) zeros
  int n = degree;
  while (n > 0 && std::abs(coeffs[n]) < 1e-300) --n;
  if (n <= 0) return 0;
  std::vector<double> a(coeffs, coeffs + n + 1);

  // initial guesses: scaled roots of unity with irrational rotation
  double amax = 0.0;
  for (int k = 0; k <= n; ++k) amax = std::max(amax, std::abs(a[k]));
  double r0 = 1.0 + std::abs(a[0]) / (std::abs(a[n]) + 1e-300);
  r0 = std::min(r0, 1e3);
  std::vector<cplx> z(n);
  for (int i = 0; i < n; ++i) {
    double th = 2.0 * M_PI * (i + 0.35) / n + 0.4;
    z[i] = r0 * cplx(std::cos(th), std::sin(th));
  }

  for (int iter = 0; iter < 120; ++iter) {
    double worst = 0.0;
    for (int i = 0; i < n; ++i) {
      cplx p, dp;
      eval_poly(a.data(), n, z[i], p, dp);
      cplx corr = (std::abs(dp) > 1e-300) ? p / dp : cplx(0.0);
      cplx sum = 0.0;
      for (int j = 0; j < n; ++j)
        if (j != i) {
          cplx d = z[i] - z[j];
          if (std::abs(d) < 1e-30) d = 1e-30;
          sum += 1.0 / d;
        }
      cplx delta = corr / (1.0 - corr * sum);
      z[i] -= delta;
      worst = std::max(worst, std::abs(delta));
    }
    if (worst < 1e-15) break;
  }
  // Newton polish
  for (int i = 0; i < n; ++i) {
    for (int it = 0; it < 3; ++it) {
      cplx p, dp;
      eval_poly(a.data(), n, z[i], p, dp);
      if (std::abs(dp) < 1e-300) break;
      z[i] -= p / dp;
    }
    roots[i] = z[i];
  }
  return n;
}

}  // namespace

extern "C" {

// Batched real-root extraction in (lo, hi).
// coeffs: (n_polys, degree+1) ascending.  roots_out: (n_polys, degree)
// padded with NaN; counts_out: number of real roots per poly (sorted).
void gdm_batched_real_roots(const double* coeffs, int64_t n_polys,
                            int degree, double lo, double hi,
                            double root_tol, double* roots_out,
                            int32_t* counts_out) {
  std::vector<cplx> rbuf(degree);
  for (int64_t ip = 0; ip < n_polys; ++ip) {
    const double* a = coeffs + ip * (degree + 1);
    double* out = roots_out + ip * degree;
    for (int k = 0; k < degree; ++k) out[k] = NAN;
    int n = aberth_roots(a, degree, rbuf.data());
    int cnt = 0;
    for (int k = 0; k < n; ++k) {
      if (std::abs(rbuf[k].imag()) < 1e-9) {
        double x = rbuf[k].real();
        if (x > lo + root_tol && x < hi - root_tol) out[cnt++] = x;
      }
    }
    // insertion sort
    for (int i = 1; i < cnt; ++i) {
      double v = out[i];
      int j = i - 1;
      while (j >= 0 && out[j] > v) {
        out[j + 1] = out[j];
        --j;
      }
      out[j + 1] = v;
    }
    counts_out[ip] = cnt;
  }
}

// Evaluate many polynomials (ascending coeffs) at many points:
// vals[ip, iq] = P_ip(x[iq]).
void gdm_batched_polyval(const double* coeffs, int64_t n_polys, int degree,
                         const double* x, int64_t n_x, double* vals) {
  for (int64_t ip = 0; ip < n_polys; ++ip) {
    const double* a = coeffs + ip * (degree + 1);
    for (int64_t iq = 0; iq < n_x; ++iq) {
      double v = a[degree];
      for (int k = degree - 1; k >= 0; --k) v = v * x[iq] + a[k];
      vals[ip * n_x + iq] = v;
    }
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Batched 2D Saye-style cut-cell quadrature (the reference's C++
// NonMatching::QuadratureGenerator counterpart, reimplemented for the
// monomial form of the per-cell level-set polynomial).
//
// For each intersected cell the level set is given as monomial
// coefficients A[i][j] of x^i y^j (reference-cell coordinates, ascending).
// The generator mirrors gdm/cut/geometry.py::QuadratureGenerator._box for
// the common path (whole cell, sign-definite height direction, no
// tangency); cells needing bisection are flagged for the python fallback.
// ---------------------------------------------------------------------------

namespace {

struct Poly2 {
  // a[i][j] coeff of x^i y^j, degree q-1 per axis
  int q;
  const double* a;  // row-major (q, q): a[i*q + j]

  double eval(double x, double y) const {
    double v = 0.0;
    double xi = 1.0;
    for (int i = 0; i < q; ++i) {
      double yj = 1.0, row = 0.0;
      for (int j = 0; j < q; ++j) {
        row += a[i * q + j] * yj;
        yj *= y;
      }
      v += xi * row;
      xi *= x;
    }
    return v;
  }
  double dx(double x, double y) const {
    double v = 0.0;
    double xi = 1.0;
    for (int i = 1; i < q; ++i) {
      double yj = 1.0, row = 0.0;
      for (int j = 0; j < q; ++j) {
        row += a[i * q + j] * yj;
        yj *= y;
      }
      v += i * xi * row;
      xi *= x;
    }
    return v;
  }
  double dy(double x, double y) const {
    double v = 0.0;
    double xi = 1.0;
    for (int i = 0; i < q; ++i) {
      double yj = 1.0, row = 0.0;
      for (int j = 1; j < q; ++j) {
        row += j * a[i * q + j] * yj;
        yj *= y;
      }
      v += xi * row;
      xi *= x;
    }
    return v;
  }
  // restriction to fixed x: coeffs in y (ascending, length q)
  void restrict_x(double x, double* out) const {
    for (int j = 0; j < q; ++j) out[j] = 0.0;
    double xi = 1.0;
    for (int i = 0; i < q; ++i) {
      for (int j = 0; j < q; ++j) out[j] += a[i * q + j] * xi;
      xi *= x;
    }
  }
  // restriction to fixed y: coeffs in x
  void restrict_y(double y, double* out) const {
    for (int i = 0; i < q; ++i) out[i] = 0.0;
    double yj = 1.0;
    for (int j = 0; j < q; ++j) {
      for (int i = 0; i < q; ++i) out[i] += a[i * q + j] * yj;
      yj *= y;
    }
  }
};

constexpr double kRootTol = 1e-11;

int real_roots_01(const double* coeffs, int degree, double* roots) {
  std::vector<cplx> buf(degree);
  int n = aberth_roots(coeffs, degree, buf.data());
  int cnt = 0;
  for (int k = 0; k < n; ++k) {
    if (std::abs(buf[k].imag()) < 1e-9) {
      double x = buf[k].real();
      if (x > kRootTol && x < 1.0 - kRootTol) roots[cnt++] = x;
    }
  }
  for (int i = 1; i < cnt; ++i) {
    double v = roots[i];
    int j = i - 1;
    while (j >= 0 && roots[j] > v) {
      roots[j + 1] = roots[j];
      --j;
    }
    roots[j + 1] = v;
  }
  return cnt;
}

struct Emitter {
  double* in_pts; double* in_w; int32_t* n_in;
  double* out_pts; double* out_w; int32_t* n_out;
  double* s_pts; double* s_w; double* s_n; int32_t* n_s;
  int maxv, maxs;
  bool overflow = false;

  void vol(bool inside, double x, double y, double w) {
    if (inside) {
      if (*n_in >= maxv) { overflow = true; return; }
      in_pts[2 * (*n_in)] = x; in_pts[2 * (*n_in) + 1] = y;
      in_w[*n_in] = w; (*n_in)++;
    } else {
      if (*n_out >= maxv) { overflow = true; return; }
      out_pts[2 * (*n_out)] = x; out_pts[2 * (*n_out) + 1] = y;
      out_w[*n_out] = w; (*n_out)++;
    }
  }
  void surf(double x, double y, double w, double nx, double ny) {
    if (*n_s >= maxs) { overflow = true; return; }
    s_pts[2 * (*n_s)] = x; s_pts[2 * (*n_s) + 1] = y;
    s_w[*n_s] = w; s_n[2 * (*n_s)] = nx; s_n[2 * (*n_s) + 1] = ny;
    (*n_s)++;
  }
};

}  // namespace

extern "C" {

// Returns per-cell status: 0 ok, 1 python fallback required.
void gdm_cut_quadrature_2d(
    const double* monos, int64_t nc, int q,
    const double* gx, const double* gw, int nq,
    double hx, double hy,
    int maxv, int maxs,
    double* in_pts, double* in_w, int32_t* n_in,
    double* out_pts, double* out_w, int32_t* n_out,
    double* s_pts, double* s_w, double* s_n, int32_t* n_s,
    int32_t* status) {
  const int deg = q - 1;
  std::vector<double> line(q), base_roots(2 * deg + 4), roots(deg);
  for (int64_t c = 0; c < nc; ++c) {
    Poly2 P{q, monos + c * q * q};
    n_in[c] = n_out[c] = n_s[c] = 0;
    status[c] = 0;
    Emitter em{in_pts + c * 2 * maxv, in_w + c * maxv, &n_in[c],
               out_pts + c * 2 * maxv, out_w + c * maxv, &n_out[c],
               s_pts + c * 2 * maxs, s_w + c * maxs, s_n + c * 2 * maxs,
               &n_s[c], maxv, maxs};

    // classify by 7x7 sampling (mirror of _box's entry check)
    double mn = 1e300, mx = -1e300;
    for (int i = 0; i < 7; ++i)
      for (int j = 0; j < 7; ++j) {
        double v = P.eval(i / 6.0, j / 6.0);
        mn = std::min(mn, v);
        mx = std::max(mx, v);
      }
    const double tol = 1e-14;
    int loc = 0;  // -1 inside, 0 intersected, +1 outside
    if (mn > -tol && mx > tol) loc = 1;
    else if (mx < tol && mn < -tol) loc = -1;
    if (loc != 0) {
      // bulk tensor Gauss rule on the whole cell
      for (int i = 0; i < nq; ++i)
        for (int j = 0; j < nq; ++j)
          em.vol(loc == -1, gx[i], gx[j], gw[i] * gw[j]);
      if (em.overflow) status[c] = 1;
      continue;
    }

    // choose sign-definite height axis (5x5 gradient samples)
    double minabs[2] = {1e300, 1e300};
    bool posdef[2] = {true, true}, negdef[2] = {true, true};
    double gmax = 0.0;
    for (int i = 0; i < 5; ++i)
      for (int j = 0; j < 5; ++j) {
        double x = i / 4.0, y = j / 4.0;
        double g0 = P.dx(x, y), g1 = P.dy(x, y);
        posdef[0] &= (g0 > 0); negdef[0] &= (g0 < 0);
        posdef[1] &= (g1 > 0); negdef[1] &= (g1 < 0);
        minabs[0] = std::min(minabs[0], std::abs(g0));
        minabs[1] = std::min(minabs[1], std::abs(g1));
        gmax = std::max(gmax, std::max(std::abs(g0), std::abs(g1)));
      }
    int k = -1;
    double best = 0.0;
    for (int d = 0; d < 2; ++d)
      if ((posdef[d] || negdef[d]) && minabs[d] > best) {
        k = d;
        best = minabs[d];
      }
    if (k < 0 || best < 1e-3 * (gmax + 1e-300)) {
      status[c] = 1;  // bisection needed -> python fallback
      continue;
    }

    // everything below is written for height = y; for height = x we swap
    // axes on the fly via the `swap` flag.
    const bool swap = (k == 0);
    auto evalP = [&](double b, double h) {
      return swap ? P.eval(h, b) : P.eval(b, h);
    };
    auto restrict_h = [&](double b, double* out) {
      if (swap) P.restrict_y(b, out);  // poly in x (height)
      else P.restrict_x(b, out);      // poly in y (height)
    };
    auto restrict_b = [&](double h, double* out) {
      if (swap) P.restrict_x(h, out);
      else P.restrict_y(h, out);
    };
    const double hb = swap ? hy : hx;  // base physical spacing
    const double hh = swap ? hx : hy;

    // base partition: roots of the two height-face restrictions
    int nb = 0;
    base_roots[nb++] = 0.0;
    for (int face = 0; face < 2; ++face) {
      restrict_b(face == 0 ? 0.0 : 1.0, line.data());
      int nr = real_roots_01(line.data(), deg, roots.data());
      for (int r = 0; r < nr; ++r) base_roots[nb++] = roots[r];
    }
    base_roots[nb++] = 1.0;
    std::sort(base_roots.begin(), base_roots.begin() + nb);

    bool fallback = false;
    for (int seg = 0; seg + 1 < nb && !fallback; ++seg) {
      double a0 = base_roots[seg], b0 = base_roots[seg + 1];
      if (b0 - a0 < kRootTol) continue;
      for (int iq = 0; iq < nq && !fallback; ++iq) {
        double cb = a0 + gx[iq] * (b0 - a0);
        double wq = gw[iq] * (b0 - a0);
        restrict_h(cb, line.data());
        int nr = real_roots_01(line.data(), deg, roots.data());
        // tangency guard (mirrors the python _box check)
        for (int r = 0; r < nr; ++r) {
          double x = swap ? roots[r] : cb;
          double y = swap ? cb : roots[r];
          double g0 = P.dx(x, y), g1 = P.dy(x, y);
          double gk = swap ? g0 : g1;
          double nrm = std::sqrt(g0 * g0 + g1 * g1);
          if (std::abs(gk) < 1e-8 * nrm) fallback = true;
        }
        if (fallback) break;
        // volume sub-intervals
        double prev = 0.0;
        for (int r = 0; r <= nr; ++r) {
          double next = (r == nr) ? 1.0 : roots[r];
          if (next - prev >= kRootTol) {
            double mid = 0.5 * (prev + next);
            // evaluate restriction at mid
            double v = 0.0, hp = 1.0;
            for (int t = 0; t < q; ++t) { v += line[t] * hp; hp *= mid; }
            bool inside = v < 0;
            for (int jq = 0; jq < nq; ++jq) {
              double ch = prev + gx[jq] * (next - prev);
              double wh = gw[jq] * (next - prev);
              double x = swap ? ch : cb;
              double y = swap ? cb : ch;
              em.vol(inside, x, y, wq * wh);
            }
          }
          prev = next;
        }
        // surface points
        for (int r = 0; r < nr; ++r) {
          double x = swap ? roots[r] : cb;
          double y = swap ? cb : roots[r];
          double gpx = P.dx(x, y) / hx;
          double gpy = P.dy(x, y) / hy;
          double nrm = std::sqrt(gpx * gpx + gpy * gpy);
          double gk = swap ? gpx : gpy;
          double w_surf = wq * hb * nrm / std::abs(gk);
          em.surf(x, y, w_surf, gpx / nrm, gpy / nrm);
        }
      }
    }
    if (fallback || em.overflow) {
      status[c] = 1;
      n_in[c] = n_out[c] = n_s[c] = 0;
    }
  }
}

}  // extern "C"
