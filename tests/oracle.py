"""Direct-loop NumPy oracle of the reference's math (test-only).

The reference (nestordemeure/friedrich, Rust) cannot be executed in this
environment, so parity is checked against this independent, deliberately
naive transcription of its formulas: per-pair kernel loops
(``algebra/mod.rs:49-53``), explicit O(n^3) inverses (``optimizer.rs:32``),
one-row-at-a-time Cholesky inserts (``algebra/mod.rs:108-125``), the exact
ADAM update rules (``optimizer.rs:103-143, 244-277``), and the reference's
quirks (Exponential's 2*ls^2 denominator, the approximate ``likelihood()``,
noise^2 on the diagonal, multiplicative updates, noise*=scale).

Nothing here is used by the library — tests compare friedrich_tpu's
vectorized/padded/sharded paths against these loops.
"""

from __future__ import annotations

import math

import numpy as np

SQRT3 = math.sqrt(3.0)
SQRT5 = math.sqrt(5.0)


def _sign(v):
    return 1.0 if v >= 0 else -1.0


# ---------------------------------------------------------------------------
# Kernels (parameters/kernel.rs)
# ---------------------------------------------------------------------------


class OSquaredExp:
    scalable = True

    def __init__(self, ls=1.0, ampl=1.0):
        self.ls, self.ampl = ls, ampl

    def kernel(self, x1, x2):
        sq = float(np.sum((np.asarray(x1) - np.asarray(x2)) ** 2))
        return abs(self.ampl) * math.exp(-sq / (2.0 * self.ls * self.ls))

    def gradient(self, x1, x2):
        sq = float(np.sum((np.asarray(x1) - np.asarray(x2)) ** 2))
        e = math.exp(-sq / (2.0 * self.ls * self.ls))
        return [sq * abs(self.ampl) * e / self.ls**3, _sign(self.ampl) * e]

    def get_parameters(self):
        return [self.ls, self.ampl]

    def set_parameters(self, p):
        self.ls, self.ampl = p[0], p[1]

    def rescale(self, s):
        self.ampl *= s

    def heuristic_fit(self, x, y):
        self.ls = fit_bandwidth_mean(x)
        self.ampl = float(np.var(y))


class OExponential(OSquaredExp):
    def kernel(self, x1, x2):
        d = float(np.linalg.norm(np.asarray(x1) - np.asarray(x2)))
        return abs(self.ampl) * math.exp(-d / (2.0 * self.ls * self.ls))

    def gradient(self, x1, x2):
        d = float(np.linalg.norm(np.asarray(x1) - np.asarray(x2)))
        e = math.exp(-d / (2.0 * self.ls * self.ls))
        return [d * abs(self.ampl) * e / self.ls**3, _sign(self.ampl) * e]


class OMatern1(OSquaredExp):
    def kernel(self, x1, x2):
        d = float(np.linalg.norm(np.asarray(x1) - np.asarray(x2)))
        x = SQRT3 * d / abs(self.ls)
        return abs(self.ampl) * (1.0 + x) * math.exp(-x)

    def gradient(self, x1, x2):
        d = float(np.linalg.norm(np.asarray(x1) - np.asarray(x2)))
        x = SQRT3 * d / abs(self.ls)
        return [
            3.0 * abs(self.ampl) * d * d * math.exp(-x) / self.ls**3,
            _sign(self.ampl) * (1.0 + x) * math.exp(-x),
        ]


class OMatern2(OSquaredExp):
    def kernel(self, x1, x2):
        d = float(np.linalg.norm(np.asarray(x1) - np.asarray(x2)))
        l = abs(self.ls)
        x = SQRT5 * d / l
        return abs(self.ampl) * (1.0 + x + 5.0 * d * d / (3.0 * l * l)) * math.exp(-x)

    def gradient(self, x1, x2):
        # kernel.rs:881-900 verbatim (x uses unsanitized self.ls)
        d = float(np.linalg.norm(np.asarray(x1) - np.asarray(x2)))
        l = abs(self.ls)
        x = SQRT5 * d / self.ls
        grad_ls = (
            _sign(self.ls)
            * abs(self.ampl)
            * ((2.0 * l / 3.0 + 1.0) + d * SQRT5 * ((l * l / 3.0 + l + 1.0) / (l * l)))
            * math.exp(-x)
        )
        grad_ampl = (
            _sign(self.ampl)
            * (1.0 + x + 5.0 * d * d / (3.0 * l * l))
            * math.exp(-x)
        )
        return [grad_ls, grad_ampl]


class OLinear:
    scalable = False

    def __init__(self, c=0.0):
        self.c = c

    def kernel(self, x1, x2):
        return float(np.dot(x1, x2)) + self.c

    def gradient(self, x1, x2):
        return [1.0]

    def get_parameters(self):
        return [self.c]

    def set_parameters(self, p):
        self.c = p[0]

    def heuristic_fit(self, x, y):
        pass


class OPolynomial:
    scalable = False

    def __init__(self, alpha=1.0, c=0.0, d=1.0):
        self.alpha, self.c, self.d = alpha, c, d

    def kernel(self, x1, x2):
        return (self.alpha * float(np.dot(x1, x2)) + self.c) ** self.d

    def gradient(self, x1, x2):
        x = float(np.dot(x1, x2))
        inner = self.alpha * x + self.c
        grad_c = self.d * inner ** (self.d - 1.0)
        # np.log: NaN (not an exception) for negative inner, like Rust f64::ln
        with np.errstate(invalid="ignore", divide="ignore"):
            grad_d = float(np.log(inner)) * inner**self.d
        return [x * grad_c, grad_c, grad_d]

    def get_parameters(self):
        return [self.alpha, self.c, self.d]

    def set_parameters(self, p):
        self.alpha, self.c, self.d = p[0], p[1], p[2]

    def heuristic_fit(self, x, y):
        pass


class OHyperTan:
    scalable = False

    def __init__(self, alpha=1.0, c=0.0):
        self.alpha, self.c = alpha, c

    def kernel(self, x1, x2):
        return math.tanh(self.alpha * float(np.dot(x1, x2)) + self.c)

    def gradient(self, x1, x2):
        x = float(np.dot(x1, x2))
        grad_c = 1.0 / math.cosh(self.alpha * x + self.c) ** 2
        return [x * grad_c, grad_c]

    def get_parameters(self):
        return [self.alpha, self.c]

    def set_parameters(self, p):
        self.alpha, self.c = p[0], p[1]

    def heuristic_fit(self, x, y):
        pass


class OMultiquadric:
    scalable = False

    def __init__(self, c=0.0):
        self.c = c

    def kernel(self, x1, x2):
        sq = float(np.sum((np.asarray(x1) - np.asarray(x2)) ** 2))
        return math.hypot(sq, self.c)

    def gradient(self, x1, x2):
        d = float(np.linalg.norm(np.asarray(x1) - np.asarray(x2)))
        return [self.c / math.hypot(d, self.c)]

    def get_parameters(self):
        return [self.c]

    def set_parameters(self, p):
        self.c = p[0]

    def heuristic_fit(self, x, y):
        pass


class ORationalQuadratic:
    scalable = False

    def __init__(self, alpha=1.0, ls=1.0):
        self.alpha, self.ls = alpha, ls

    def kernel(self, x1, x2):
        sq = float(np.sum((np.asarray(x1) - np.asarray(x2)) ** 2))
        return (1.0 + sq / (2.0 * self.alpha * self.ls * self.ls)) ** (-self.alpha)

    def gradient(self, x1, x2):
        sq = float(np.sum((np.asarray(x1) - np.asarray(x2)) ** 2))
        alpha, l = self.alpha, abs(self.ls)
        l2 = l * l
        grad_alpha = ((sq + 2.0 * l2 * alpha) / (l2 * alpha)) ** (-alpha) * (
            2.0**alpha
            * (1.0 - math.log((sq + 2.0 * l2 * alpha) / (2.0 * l2 * alpha)))
            - (l2 * 2.0 ** (alpha + 1.0) * alpha) / (sq + 2.0 * l2 * alpha)
        )
        grad_ls = sq * (sq / (2.0 * alpha * l * l) + 1.0) ** (-alpha - 1.0) / self.ls**3
        return [grad_alpha, grad_ls]

    def get_parameters(self):
        return [self.alpha, self.ls]

    def set_parameters(self, p):
        self.alpha, self.ls = p[0], p[1]

    def heuristic_fit(self, x, y):
        pass


class OKernelSum:
    def __init__(self, k1, k2):
        self.k1, self.k2 = k1, k2

    @property
    def scalable(self):
        return self.k1.scalable and self.k2.scalable

    def kernel(self, x1, x2):
        return self.k1.kernel(x1, x2) + self.k2.kernel(x1, x2)

    def gradient(self, x1, x2):
        return self.k1.gradient(x1, x2) + self.k2.gradient(x1, x2)

    def get_parameters(self):
        return self.k1.get_parameters() + self.k2.get_parameters()

    def set_parameters(self, p):
        n1 = len(self.k1.get_parameters())
        self.k1.set_parameters(p[:n1])
        self.k2.set_parameters(p[n1:])

    def rescale(self, s):
        self.k1.rescale(s)
        self.k2.rescale(s)


class OKernelProd(OKernelSum):
    @property
    def scalable(self):
        return self.k1.scalable or self.k2.scalable

    def kernel(self, x1, x2):
        return self.k1.kernel(x1, x2) * self.k2.kernel(x1, x2)

    def gradient(self, x1, x2):
        v1, v2 = self.k1.kernel(x1, x2), self.k2.kernel(x1, x2)
        return [g * v2 for g in self.k1.gradient(x1, x2)] + [
            g * v1 for g in self.k2.gradient(x1, x2)
        ]

    def rescale(self, s):
        if self.k1.scalable:
            self.k1.rescale(s)
        else:
            self.k2.rescale(s)


# ---------------------------------------------------------------------------
# Heuristics (kernel.rs:94-119)
# ---------------------------------------------------------------------------


def fit_bandwidth_mean(x):
    x = np.asarray(x)
    n = x.shape[0]
    total = 0.0
    for i in range(n):
        for j in range(i + 1, n):
            total += float(np.linalg.norm(x[i] - x[j]))
    return total / ((n * n - n) / 2.0)


# ---------------------------------------------------------------------------
# Priors (parameters/prior.rs)
# ---------------------------------------------------------------------------


class OZeroPrior:
    def prior(self, x):
        return np.zeros(np.asarray(x).shape[0])

    def fit(self, x, y):
        pass


class OConstantPrior:
    def __init__(self, c=0.0):
        self.c = c

    def prior(self, x):
        return np.full(np.asarray(x).shape[0], self.c)

    def fit(self, x, y):
        self.c = float(np.mean(y))


class OLinearPrior:
    def __init__(self, weights, intercept=0.0):
        self.weights = np.asarray(weights, dtype=float)
        self.intercept = intercept

    def prior(self, x):
        return np.asarray(x) @ self.weights + self.intercept

    def fit(self, x, y):
        design = np.concatenate([np.ones((len(x), 1)), np.asarray(x)], axis=1)
        sol, *_ = np.linalg.lstsq(design, np.asarray(y), rcond=None)
        self.intercept = float(sol[0])
        self.weights = sol[1:]


# ---------------------------------------------------------------------------
# Algebra (algebra/mod.rs)
# ---------------------------------------------------------------------------


def make_covariance_matrix(m1, m2, kern):
    m1, m2 = np.asarray(m1), np.asarray(m2)
    out = np.empty((m1.shape[0], m2.shape[0]))
    for r in range(m1.shape[0]):
        for c in range(m2.shape[0]):
            out[r, c] = kern.kernel(m1[r], m2[c])
    return out


def make_cov(x, kern, noise):
    k = make_covariance_matrix(x, x, kern)
    k[np.diag_indices_from(k)] += noise * noise
    return k


def make_cholesky_cov_matrix(x, kern, noise):
    return np.linalg.cholesky(make_cov(x, kern, noise))


def make_gradient_covariance_matrices(x, kern):
    x = np.asarray(x)
    n = x.shape[0]
    p = len(kern.gradient(x[0], x[0]))
    mats = [np.empty((n, n)) for _ in range(p)]
    for c in range(n):
        for r in range(c, n):
            g = kern.gradient(x[c], x[r])
            for gi, m in zip(g, mats):
                m[r, c] = gi
                m[c, r] = gi
    return mats


def cholesky_insert_row(l_old, x_old, x_new_row, kern, noise):
    """One-row Cholesky append as in ``add_rows_cholesky_cov_matrix``
    (``algebra/mod.rs:108-125``)."""
    n = l_old.shape[0]
    col = np.array([kern.kernel(x_old[i], x_new_row) for i in range(n)])
    diag = kern.kernel(x_new_row, x_new_row) + noise * noise
    s = np.linalg.solve(l_old, col) if n else np.zeros(0)
    d = math.sqrt(diag - float(s @ s))
    out = np.zeros((n + 1, n + 1))
    out[:n, :n] = l_old
    out[n, :n] = s
    out[n, n] = d
    return out


# ---------------------------------------------------------------------------
# GP model (gaussian_process/mod.rs)
# ---------------------------------------------------------------------------


class OracleGP:
    def __init__(self, prior, kern, noise, x, y):
        self.prior, self.kern, self.noise = prior, kern, noise
        self.x = np.asarray(x, dtype=float)
        self.resid = np.asarray(y, dtype=float) - prior.prior(self.x)
        self.l = make_cholesky_cov_matrix(self.x, kern, noise)

    def _solve_k(self, b):
        z = np.linalg.solve(self.l, b)
        return np.linalg.solve(self.l.T, z)

    def predict(self, xq):
        c = make_covariance_matrix(self.x, xq, self.kern)
        w = self._solve_k(c)
        return self.prior.prior(xq) + w.T @ self.resid

    def predict_variance(self, xq):
        c = make_covariance_matrix(self.x, xq, self.kern)
        kl = np.linalg.solve(self.l, c)
        base = np.array([self.kern.kernel(q, q) for q in np.asarray(xq)])
        return base - np.sum(kl * kl, axis=0)

    def predict_covariance(self, xq):
        c = make_covariance_matrix(self.x, xq, self.kern)
        kqq = make_covariance_matrix(xq, xq, self.kern)
        kl = np.linalg.solve(self.l, c)
        return kqq - kl.T @ kl

    def posterior(self, xq):
        c = make_covariance_matrix(self.x, xq, self.kern)
        w = self._solve_k(c)
        kqq = make_covariance_matrix(xq, xq, self.kern)
        cov = kqq - c.T @ w
        mean = self.prior.prior(xq) + w.T @ self.resid
        return mean, cov

    def likelihood(self):
        # mod.rs:196-220 (approximate complexity penalty, replicated)
        ol = np.linalg.solve(self.l, self.resid)
        data_fit = float(ol @ ol)
        complexity = sum(
            math.log(abs(self.kern.kernel(r, r) + self.noise * self.noise))
            for r in self.x
        )
        n = self.x.shape[0]
        return -(data_fit + complexity + n * math.log(2.0 * math.pi)) / 2.0

    def add_samples(self, x_new, y_new):
        x_new = np.asarray(x_new, dtype=float)
        r_new = np.asarray(y_new, dtype=float) - self.prior.prior(x_new)
        for i in range(x_new.shape[0]):
            self.l = cholesky_insert_row(
                self.l, self.x, x_new[i], self.kern, self.noise
            )
            self.x = np.vstack([self.x, x_new[i]])
        self.resid = np.concatenate([self.resid, r_new])

    # -- optimizer (optimizer.rs) -----------------------------------------

    def gradient_marginal_likelihood(self):
        cov_inv = np.linalg.inv(self.l @ self.l.T)
        alpha = cov_inv @ self.resid
        results = []
        for dk in make_gradient_covariance_matrices(self.x, self.kern):
            data_fit = float(alpha @ dk @ alpha)
            complexity = float(np.sum(cov_inv * dk.T))
            results.append((data_fit - complexity) / 2.0)
        data_fit = float(alpha @ alpha)
        complexity = float(np.trace(cov_inv))
        results.append(self.noise * (data_fit - complexity))
        return results

    def scaled_gradient_marginal_likelihood(self):
        cov_inv = np.linalg.inv(self.l @ self.l.T)
        alpha = cov_inv @ self.resid
        scale = float(self.resid @ alpha) / len(self.resid)
        results = []
        for dk in make_gradient_covariance_matrices(self.x, self.kern):
            data_fit = float(alpha @ dk @ alpha) / scale
            complexity = float(np.sum(cov_inv * dk.T))
            results.append((data_fit - complexity) / 2.0)
        return scale, results

    def optimize_parameters(self, max_iter, convergence_fraction):
        beta1, beta2, eps, lr = 0.9, 0.999, 1e-8, 0.1
        params = [p if p != 0 else eps for p in self.kern.get_parameters()]
        params.append(math.log(self.noise))
        mean_grad = [0.0] * len(params)
        var_grad = [0.0] * len(params)
        for i in range(1, max_iter + 1):
            grads = self.gradient_marginal_likelihood()
            grads[-1] *= self.noise
            progress = False
            for p in range(len(params)):
                mean_grad[p] = beta1 * mean_grad[p] + (1 - beta1) * grads[p]
                var_grad[p] = beta2 * var_grad[p] + (1 - beta2) * grads[p] ** 2
                mb = mean_grad[p] / (1 - beta1**i)
                vb = var_grad[p] / (1 - beta2**i)
                delta = lr * mb / (math.sqrt(vb) + eps)
                progress |= abs(delta) > convergence_fraction
                params[p] *= 1 + delta
            self.kern.set_parameters(params[:-1])
            self.noise = math.exp(params[-1])
            self.l = make_cholesky_cov_matrix(self.x, self.kern, self.noise)
            if not progress:
                break

    def scaled_optimize_parameters(self, max_iter, convergence_fraction):
        beta1, beta2, eps, lr = 0.9, 0.999, 1e-8, 0.1
        params = [p if p != 0 else eps for p in self.kern.get_parameters()]
        mean_grad = [0.0] * len(params)
        var_grad = [0.0] * len(params)
        for i in range(1, max_iter + 1):
            scale, grads = self.scaled_gradient_marginal_likelihood()
            progress = False
            for p in range(len(params)):
                mean_grad[p] = beta1 * mean_grad[p] + (1 - beta1) * grads[p]
                var_grad[p] = beta2 * var_grad[p] + (1 - beta2) * grads[p] ** 2
                mb = mean_grad[p] / (1 - beta1**i)
                vb = var_grad[p] / (1 - beta2**i)
                delta = lr * mb / (math.sqrt(vb) + eps)
                progress |= abs(delta) > convergence_fraction
                params[p] *= 1 + delta
            self.kern.set_parameters(params)
            self.kern.rescale(scale)
            self.noise *= scale
            params = self.kern.get_parameters()
            self.l = make_cholesky_cov_matrix(self.x, self.kern, self.noise)
            if not progress:
                break

    def fit_parameters(self, fit_prior, fit_kernel, max_iter, convergence_fraction):
        if fit_prior:
            y = self.resid + self.prior.prior(self.x)
            self.prior.fit(self.x, y)
            self.resid = y - self.prior.prior(self.x)
            if not fit_kernel:
                self.l = make_cholesky_cov_matrix(self.x, self.kern, self.noise)
        if fit_kernel:
            if self.kern.scalable:
                self.scaled_optimize_parameters(max_iter, convergence_fraction)
            else:
                self.optimize_parameters(max_iter, convergence_fraction)


def oracle_default_gp(x, y):
    """``GaussianProcess::default``: heuristics + fit prior + scaled fit."""
    x, y = np.asarray(x, dtype=float), np.asarray(y, dtype=float)
    kern = OSquaredExp()
    kern.heuristic_fit(x, y)
    noise = 0.1 * math.sqrt(float(np.var(y)))
    prior = OConstantPrior(0.0)
    gp = OracleGP(prior, kern, noise, x, y)
    gp.fit_parameters(True, True, 100, 0.05)
    return gp
