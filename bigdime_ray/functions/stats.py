"""Statistical test kernels used by the distribution-drift validators.

scipy is not available in this environment, so the special functions are
hand-rolled (Numerical Recipes-style regularized incomplete gamma):

- ``chi2_sf(x, df)`` — survival function of the chi-square distribution,
  used by the token-id-histogram drift check (``BASELINE.json:6``
  "chi-square on token-id histograms").
- ``chi2_statistic(obs, exp)`` — Pearson statistic over two histograms
  (expected scaled to the observed total; zero-expected bins pooled).
- ``ks_statistic_from_cdfs`` / ``ks_pvalue`` — two-sample
  Kolmogorov–Smirnov D and its asymptotic p-value, used by the n_tok
  drift check ("KS on n_tok").
"""

from __future__ import annotations

import math

import numpy as np

_MAX_ITER = 500
_EPS = 3.0e-14


def _gamma_p_series(a: float, x: float) -> float:
    """Lower regularized incomplete gamma P(a, x) by series (x < a+1)."""
    if x <= 0.0:
        return 0.0
    ap = a
    summ = 1.0 / a
    delta = summ
    for _ in range(_MAX_ITER):
        ap += 1.0
        delta *= x / ap
        summ += delta
        if abs(delta) < abs(summ) * _EPS:
            break
    return summ * math.exp(-x + a * math.log(x) - math.lgamma(a))


def _gamma_q_contfrac(a: float, x: float) -> float:
    """Upper regularized incomplete gamma Q(a, x) by continued fraction (x >= a+1)."""
    tiny = 1.0e-300
    b = x + 1.0 - a
    c = 1.0 / tiny
    d = 1.0 / b
    h = d
    for i in range(1, _MAX_ITER + 1):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < tiny:
            d = tiny
        c = b + an / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < _EPS:
            break
    return h * math.exp(-x + a * math.log(x) - math.lgamma(a))


def gamma_q(a: float, x: float) -> float:
    """Upper regularized incomplete gamma Q(a, x) = 1 - P(a, x)."""
    if x < 0.0 or a <= 0.0:
        raise ValueError("gamma_q domain: a > 0, x >= 0")
    if x == 0.0:
        return 1.0
    if x < a + 1.0:
        return 1.0 - _gamma_p_series(a, x)
    return _gamma_q_contfrac(a, x)


def chi2_sf(x: float, df: int) -> float:
    """P[Chi2(df) > x]."""
    if x <= 0:
        return 1.0
    return gamma_q(df / 2.0, x / 2.0)


def chi2_statistic(observed: np.ndarray, expected: np.ndarray,
                   min_expected: float = 5.0) -> tuple[float, int]:
    """Pearson chi-square of ``observed`` counts vs ``expected`` counts.

    Expected is rescaled to the observed total (shape comparison). Bins
    whose rescaled expectation is below ``min_expected`` are pooled into
    one tail bin (standard validity fix). Returns (statistic, dof).
    """
    obs = np.asarray(observed, dtype=np.float64)
    exp = np.asarray(expected, dtype=np.float64)
    if obs.shape != exp.shape:
        raise ValueError("histogram shapes differ")
    n_obs, n_exp = obs.sum(), exp.sum()
    if n_obs == 0 or n_exp == 0:
        return 0.0, 0
    exp = exp * (n_obs / n_exp)
    small = exp < min_expected
    if small.any():
        obs = np.append(obs[~small], obs[small].sum())
        exp = np.append(exp[~small], exp[small].sum())
    keep = exp > 0
    obs, exp = obs[keep], exp[keep]
    if len(obs) < 2:
        return 0.0, 0
    stat = float(((obs - exp) ** 2 / exp).sum())
    return stat, len(obs) - 1


def ks_statistic_from_cdfs(grid: np.ndarray, cdf_a: np.ndarray,
                           cdf_b: np.ndarray) -> float:
    """sup |F_a - F_b| evaluated on a shared grid."""
    return float(np.abs(np.asarray(cdf_a) - np.asarray(cdf_b)).max(initial=0.0))


def ks_pvalue(d: float, n_a: float, n_b: float) -> float:
    """Asymptotic two-sample KS p-value (Kolmogorov distribution tail)."""
    if d <= 0:
        return 1.0
    n_eff = n_a * n_b / (n_a + n_b)
    lam = (math.sqrt(n_eff) + 0.12 + 0.11 / math.sqrt(n_eff)) * d
    s = 0.0
    for k in range(1, 101):
        term = 2.0 * (-1.0) ** (k - 1) * math.exp(-2.0 * k * k * lam * lam)
        s += term
        if abs(term) < 1e-12:
            break
    return max(0.0, min(1.0, s))
