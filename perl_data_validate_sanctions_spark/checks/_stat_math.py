"""Pure-numpy statistics used by the drift check (no scipy in the
container). Standard public formulas:

- regularized upper incomplete gamma Q(s, x) via the series expansion
  (x < s+1) / Lentz continued fraction (x >= s+1) — the classic
  numerical-recipes decomposition; gives the chi-square survival
  function sf(x, k) = Q(k/2, x/2).
- asymptotic two-sample Kolmogorov-Smirnov p-value
  Q_KS(lambda) = 2 * sum_{j>=1} (-1)^{j-1} exp(-2 j^2 lambda^2).
"""

from __future__ import annotations

import math

import numpy as np


def gammainc_q(s: float, x: float) -> float:
    """Regularized upper incomplete gamma Q(s, x), s > 0, x >= 0."""
    if x < 0 or s <= 0:
        raise ValueError("domain")
    if x == 0:
        return 1.0
    if x < s + 1.0:
        # lower series: P(s,x) = e^{-x} x^s / Γ(s) * Σ x^n / (s (s+1) ...)
        term = 1.0 / s
        total = term
        n = s
        for _ in range(1000):
            n += 1.0
            term *= x / n
            total += term
            if abs(term) < abs(total) * 1e-15:
                break
        log_p = -x + s * math.log(x) - math.lgamma(s) + math.log(total)
        return max(0.0, min(1.0, 1.0 - math.exp(log_p)))
    # upper continued fraction (modified Lentz)
    tiny = 1e-300
    b = x + 1.0 - s
    c = 1.0 / tiny
    d = 1.0 / b
    h = d
    for i in range(1, 1000):
        an = -i * (i - s)
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
        if abs(delta - 1.0) < 1e-15:
            break
    log_q = -x + s * math.log(x) - math.lgamma(s) + math.log(h)
    return max(0.0, min(1.0, math.exp(log_q)))


def chi2_sf(x: float, k: int) -> float:
    """Chi-square survival function P(X >= x) with k degrees of freedom."""
    if k <= 0:
        return float("nan")
    if x <= 0:
        return 1.0
    return gammainc_q(k / 2.0, x / 2.0)


def ks_pvalue(lam: float) -> float:
    """Asymptotic Kolmogorov distribution survival Q_KS(lambda)."""
    if lam <= 0:
        return 1.0
    total = 0.0
    for j in range(1, 101):
        term = 2.0 * (-1.0) ** (j - 1) * math.exp(-2.0 * j * j * lam * lam)
        total += term
        if abs(term) < 1e-12:
            break
    return max(0.0, min(1.0, total))


def ks_two_sample_from_counts(
    values: np.ndarray, counts_a: np.ndarray, counts_b: np.ndarray
) -> tuple[float, float]:
    """Two-sample KS over binned data (exact for discrete-valued columns:
    the binned counts ARE the empirical distribution).

    Returns (statistic D, p_value)."""
    order = np.argsort(values)
    ca = counts_a[order].astype(np.float64)
    cb = counts_b[order].astype(np.float64)
    na, nb = ca.sum(), cb.sum()
    if na == 0 or nb == 0:
        return 0.0, 1.0
    d = float(np.max(np.abs(np.cumsum(ca) / na - np.cumsum(cb) / nb)))
    n_eff = na * nb / (na + nb)
    lam = (math.sqrt(n_eff) + 0.12 + 0.11 / math.sqrt(n_eff)) * d
    return d, ks_pvalue(lam)


def chi2_from_counts(
    observed: np.ndarray, expected_props: np.ndarray
) -> tuple[float, float, int]:
    """Chi-square GoF of observed counts vs expected proportions.

    Returns (statistic, p_value, dof). Categories with expected
    proportion 0 are merged into the residual mass.
    """
    obs = observed.astype(np.float64)
    n = obs.sum()
    if n == 0:
        return 0.0, 1.0, 0
    exp = expected_props.astype(np.float64) * n
    mask = exp > 0
    stat = float(np.sum((obs[mask] - exp[mask]) ** 2 / exp[mask]))
    # any observed mass on zero-expected categories is an infinite-stat
    # signal; cap it with a large finite contribution
    extra = obs[~mask].sum()
    if extra > 0:
        stat += float(extra) * 1e6
    dof = int(mask.sum()) - 1
    if dof <= 0:
        return stat, 1.0, 0
    return stat, chi2_sf(stat, dof), dof
