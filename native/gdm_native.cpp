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
