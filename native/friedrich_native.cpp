// friedrich-tpu native CPU library.
//
// C++ counterpart of the reference's nalgebra compute layer (the slot that
// crate filled with Rust: dense f64 kernel-matrix construction, Cholesky
// factorization with the `new_with_substitute` epsilon semantics,
// triangular solves, and the predict paths). Used from Python via ctypes
// as (a) an independent fast oracle for parity tests and (b) a CPU
// serving fallback with no JAX dependency.
//
// Formula sources (transcribed, not copied): parameters/kernel.rs (all
// nine kernels, including the Exponential 2*ls^2 quirk at kernel.rs:664
// and Multiquadric hypot(sq, c) at kernel.rs:1049), algebra/mod.rs
// (noise^2 diagonal, :78), gaussian_process/mod.rs (predict paths).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libfriedrich_native.so
//        friedrich_native.cpp

#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// Kernel ids (keep in sync with friedrich_tpu/native.py)
enum KernelId {
  K_SQUARED_EXP = 0,   // params: ls, ampl
  K_EXPONENTIAL = 1,   // params: ls, ampl
  K_MATERN1 = 2,       // params: ls, ampl
  K_MATERN2 = 3,       // params: ls, ampl
  K_RATIONAL_QUAD = 4, // params: alpha, ls
  K_LINEAR = 5,        // params: c
  K_POLYNOMIAL = 6,    // params: alpha, c, d
  K_HYPERTAN = 7,      // params: alpha, c
  K_MULTIQUADRIC = 8,  // params: c
};

static inline double sq_dist(const double* a, const double* b, int64_t d) {
  double s = 0.0;
  for (int64_t k = 0; k < d; ++k) {
    const double t = a[k] - b[k];
    s += t * t;
  }
  return s;
}

static inline double dot(const double* a, const double* b, int64_t d) {
  double s = 0.0;
  for (int64_t k = 0; k < d; ++k) s += a[k] * b[k];
  return s;
}

static double kernel_eval(int kid, const double* p, const double* x1,
                          const double* x2, int64_t d) {
  switch (kid) {
    case K_SQUARED_EXP: {
      const double sq = sq_dist(x1, x2, d);
      return std::fabs(p[1]) * std::exp(-sq / (2.0 * p[0] * p[0]));
    }
    case K_EXPONENTIAL: {
      // distance NOT squared, denominator still 2*ls^2 (kernel.rs:663-665)
      const double dist = std::sqrt(sq_dist(x1, x2, d));
      return std::fabs(p[1]) * std::exp(-dist / (2.0 * p[0] * p[0]));
    }
    case K_MATERN1: {
      const double dist = std::sqrt(sq_dist(x1, x2, d));
      const double x = std::sqrt(3.0) * dist / std::fabs(p[0]);
      return std::fabs(p[1]) * (1.0 + x) * std::exp(-x);
    }
    case K_MATERN2: {
      const double dist = std::sqrt(sq_dist(x1, x2, d));
      const double l = std::fabs(p[0]);
      const double x = std::sqrt(5.0) * dist / l;
      return std::fabs(p[1]) *
             (1.0 + x + 5.0 * dist * dist / (3.0 * l * l)) * std::exp(-x);
    }
    case K_RATIONAL_QUAD: {
      const double sq = sq_dist(x1, x2, d);
      return std::pow(1.0 + sq / (2.0 * p[0] * p[1] * p[1]), -p[0]);
    }
    case K_LINEAR:
      return dot(x1, x2, d) + p[0];
    case K_POLYNOMIAL:
      return std::pow(p[0] * dot(x1, x2, d) + p[1], p[2]);
    case K_HYPERTAN:
      return std::tanh(p[0] * dot(x1, x2, d) + p[1]);
    case K_MULTIQUADRIC:
      // hypot of SQUARED norm and c (kernel.rs:1044-1050)
      return std::hypot(sq_dist(x1, x2, d), p[0]);
    default:
      return 0.0;
  }
}

// Composite ops for two-kernel compositions (KernelSum / KernelProd).
enum CompositeOp { OP_SINGLE = 0, OP_SUM = 1, OP_PROD = 2 };

static double composite_eval(int op, int kid1, const double* p1, int kid2,
                             const double* p2, const double* x1,
                             const double* x2, int64_t d) {
  const double v1 = kernel_eval(kid1, p1, x1, x2, d);
  if (op == OP_SINGLE) return v1;
  const double v2 = kernel_eval(kid2, p2, x1, x2, d);
  return op == OP_SUM ? v1 + v2 : v1 * v2;
}

// K(X1, X2): out is (n1, n2) row-major.
void cov_matrix(int kid, const double* params, const double* x1, int64_t n1,
                const double* x2, int64_t n2, int64_t d, double* out) {
  for (int64_t i = 0; i < n1; ++i)
    for (int64_t j = 0; j < n2; ++j)
      out[i * n2 + j] = kernel_eval(kid, params, x1 + i * d, x2 + j * d, d);
}

// Composite variant: op in {1=sum, 2=prod} over two kernels.
void cov_matrix2(int op, int kid1, const double* p1, int kid2,
                 const double* p2, const double* x1, int64_t n1,
                 const double* x2, int64_t n2, int64_t d, double* out) {
  for (int64_t i = 0; i < n1; ++i)
    for (int64_t j = 0; j < n2; ++j)
      out[i * n2 + j] =
          composite_eval(op, kid1, p1, kid2, p2, x1 + i * d, x2 + j * d, d);
}

void train_cov2(int op, int kid1, const double* p1, int kid2,
                const double* p2, const double* x, int64_t n, int64_t d,
                double noise, double* out) {
  for (int64_t i = 0; i < n; ++i) {
    for (int64_t j = 0; j <= i; ++j) {
      const double v =
          composite_eval(op, kid1, p1, kid2, p2, x + i * d, x + j * d, d);
      out[i * n + j] = v;
      out[j * n + i] = v;
    }
    out[i * n + i] += noise * noise;
  }
}

// Training covariance: K(X, X) + noise^2 I (algebra/mod.rs:59-79).
void train_cov(int kid, const double* params, const double* x, int64_t n,
               int64_t d, double noise, double* out) {
  for (int64_t i = 0; i < n; ++i) {
    for (int64_t j = 0; j <= i; ++j) {
      const double v = kernel_eval(kid, params, x + i * d, x + j * d, d);
      out[i * n + j] = v;
      out[j * n + i] = v;
    }
    out[i * n + i] += noise * noise;
  }
}

// In-place lower Cholesky with optional epsilon pivot substitution
// (nalgebra new_with_substitute semantics). Returns 0 on success, -1 if a
// pivot failed and use_eps was 0.
int cholesky_factor(double* a, int64_t n, double eps, int use_eps) {
  for (int64_t j = 0; j < n; ++j) {
    double diag = a[j * n + j];
    for (int64_t k = 0; k < j; ++k) diag -= a[j * n + k] * a[j * n + k];
    if (!(diag > 0.0)) {
      if (!use_eps) return -1;
      diag = eps;
    }
    const double ljj = std::sqrt(diag);
    a[j * n + j] = ljj;
    for (int64_t i = j + 1; i < n; ++i) {
      double v = a[i * n + j];
      for (int64_t k = 0; k < j; ++k) v -= a[i * n + k] * a[j * n + k];
      a[i * n + j] = v / ljj;
    }
    for (int64_t i = j + 1; i < n; ++i) a[j * n + i] = 0.0;  // zero upper
  }
  return 0;
}

// Forward substitution: solve L y = b for m right-hand sides (b is (n, m)
// row-major, overwritten with y).
void solve_lower(const double* l, double* b, int64_t n, int64_t m) {
  for (int64_t i = 0; i < n; ++i) {
    for (int64_t c = 0; c < m; ++c) {
      double v = b[i * m + c];
      for (int64_t k = 0; k < i; ++k) v -= l[i * n + k] * b[k * m + c];
      b[i * m + c] = v / l[i * n + i];
    }
  }
}

// Backward substitution: solve L^T x = b (b overwritten).
void solve_lower_t(const double* l, double* b, int64_t n, int64_t m) {
  for (int64_t i = n - 1; i >= 0; --i) {
    for (int64_t c = 0; c < m; ++c) {
      double v = b[i * m + c];
      for (int64_t k = i + 1; k < n; ++k) v -= l[k * n + i] * b[k * m + c];
      b[i * m + c] = v / l[i * n + i];
    }
  }
}

// Full predict path (gaussian_process/mod.rs:290-326): given a factored L
// and residuals, compute posterior mean and latent variance at xq.
// work must hold n * m doubles.
void gp_predict_mean_var(int kid, const double* params, const double* x,
                         int64_t n, int64_t d, const double* l,
                         const double* resid, const double* xq, int64_t m,
                         double* work, double* mean_out, double* var_out) {
  // C = K(X, Xq): (n, m)
  cov_matrix(kid, params, x, n, xq, m, d, work);
  // kl = L^-1 C
  solve_lower(l, work, n, m);
  for (int64_t j = 0; j < m; ++j) {
    double s = 0.0;
    for (int64_t i = 0; i < n; ++i) s += work[i * m + j] * work[i * m + j];
    var_out[j] = kernel_eval(kid, params, xq + j * d, xq + j * d, d) - s;
  }
  // w = L^-T kl ; mean = w^T resid
  solve_lower_t(l, work, n, m);
  for (int64_t j = 0; j < m; ++j) {
    double s = 0.0;
    for (int64_t i = 0; i < n; ++i) s += work[i * m + j] * resid[i];
    mean_out[j] = s;  // caller adds the prior mean
  }
}

}  // extern "C"
