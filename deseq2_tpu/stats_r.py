"""R-compatible statistical utilities: BH adjustment and lowess.

Reference dependencies reimplemented for exact semantics:
- p.adjust(..., "BH") including R's lazy-evaluation NA handling
  (n = number of non-NA p-values)
- stats::lowess (Cleveland's clowess with delta-skipping and bisquare
  robustness iterations), used by independent filtering
  (R/results.R:661-692)
"""

from __future__ import annotations

import numpy as np


def p_adjust_bh(p):
    """Benjamini-Hochberg, matching R's p.adjust (NAs stay NA and are
    excluded from n)."""
    p = np.asarray(p, dtype=np.float64)
    out = np.full(p.shape, np.nan)
    nna = ~np.isnan(p)
    pv = p[nna]
    n = len(pv)
    if n == 0:
        return out
    if n == 1:
        out[nna] = pv
        return out
    order = np.argsort(-pv, kind="stable")
    ranked = pv[order]
    i = np.arange(n, 0, -1)
    adj = np.minimum(1.0, np.minimum.accumulate(n / i * ranked))
    inv = np.empty(n, dtype=np.int64)
    inv[order] = np.arange(n)
    out[nna] = adj[inv]
    return out


def p_adjust(p, method="BH"):
    """R's p.adjust for all supported methods (NAs stay NA and are
    excluded from n, matching R's lazily-evaluated default n)."""
    if method == "fdr":
        method = "BH"
    if method not in ("BH", "none", "bonferroni", "holm", "hochberg",
                      "hommel", "BY"):
        raise ValueError(f"unknown p.adjust method: {method}")
    p = np.asarray(p, dtype=np.float64)
    out = np.full(p.shape, np.nan)
    nna = ~np.isnan(p)
    pv = p[nna]
    n = len(pv)
    if n == 0:
        return out
    if method == "none" or n == 1:
        out[nna] = pv
        return out
    if method == "BH":
        return p_adjust_bh(p)
    if method == "bonferroni":
        out[nna] = np.minimum(1.0, n * pv)
        return out
    asc = np.argsort(pv, kind="stable")
    inv = np.empty(n, dtype=np.int64)
    inv[asc] = np.arange(n)
    if method == "holm":
        i = np.arange(1, n + 1)
        adj = np.minimum(1.0, np.maximum.accumulate((n - i + 1) * pv[asc]))
        out[nna] = adj[inv]
        return out
    if method == "hochberg":
        i = np.arange(n, 0, -1)
        ranked = pv[asc][::-1]       # descending
        adj = np.minimum(1.0, np.minimum.accumulate(
            (n - i + 1) * ranked))[::-1]
        out[nna] = adj[inv]
        return out
    if method == "BY":
        q = np.sum(1.0 / np.arange(1, n + 1))
        i = np.arange(n, 0, -1)
        ranked = pv[asc][::-1]
        adj = np.minimum(1.0, np.minimum.accumulate(
            q * n / i * ranked))[::-1]
        out[nna] = adj[inv]
        return out
    # hommel (R's algorithm, p.adjust source)
    s = pv[asc]
    q = np.full(n, np.min(n * s / np.arange(1, n + 1)))
    pa = q.copy()
    for j in range(n - 1, 1, -1):
        ij = np.arange(n - j + 1)
        i2 = np.arange(n - j + 1, n)
        q1 = np.min(j * s[i2] / np.arange(2, j + 1))
        q[ij] = np.minimum(j * s[ij], q1)
        q[i2] = q[n - j]
        pa = np.maximum(pa, q)
    pa = np.maximum(pa, s)
    out[nna] = pa[inv]
    return out


def _lowest(x, y, xs, nleft, nright, rw, use_rw, xrange):
    """Local weighted linear fit at xs (C lowest() from R's lowess)."""
    h = max(xs - x[nleft], x[nright] - xs)
    h9 = 0.999 * h
    h1 = 0.001 * h
    n = len(x)
    a = 0.0
    w = np.zeros(n)
    j = nleft
    while j < n:
        r = abs(x[j] - xs)
        if r <= h9:
            if r <= h1:
                w[j] = 1.0
            else:
                w[j] = (1.0 - (r / h) ** 3) ** 3
            if use_rw:
                w[j] *= rw[j]
            a += w[j]
        elif x[j] > xs:
            break
        j += 1
    nrt = j - 1
    if a <= 0.0:
        return None
    w[nleft:nrt + 1] /= a
    if h > 0.0:
        a = 0.0
        for j in range(nleft, nrt + 1):
            a += w[j] * x[j]
        b = xs - a
        c = 0.0
        for j in range(nleft, nrt + 1):
            c += w[j] * (x[j] - a) ** 2
        if np.sqrt(c) > 0.001 * xrange:
            b /= c
            for j in range(nleft, nrt + 1):
                w[j] *= b * (x[j] - a) + 1.0
    ys = 0.0
    for j in range(nleft, nrt + 1):
        ys += w[j] * y[j]
    return ys


def r_lowess(x, y, f=2.0 / 3.0, niter=3, delta=None):
    """R's stats::lowess (clowess).  x must not contain NaN.

    Returns (x_sorted, fitted)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    order = np.argsort(x, kind="stable")
    x, y = x[order], y[order]
    n = len(x)
    if n < 2:
        return x, y.copy()
    if delta is None:
        delta = 0.01 * (x[-1] - x[0])
    ns = max(min(int(f * n + 1e-7), n), 2)
    xrange = x[-1] - x[0]
    fitted = np.zeros(n)
    rw = np.ones(n)
    for iteration in range(niter + 1):
        use_rw = iteration > 0
        nleft, nright = 0, ns - 1
        last = -1
        i = 0
        while True:
            if nright < n - 1:
                while nright < n - 1:
                    d1 = x[i] - x[nleft]
                    d2 = x[nright + 1] - x[i]
                    if d1 <= d2:
                        break
                    nleft += 1
                    nright += 1
            ys = _lowest(x, y, x[i], nleft, nright, rw, use_rw, xrange)
            fitted[i] = ys if ys is not None else y[i]
            if last < i - 1:
                denom = x[i] - x[last]
                for j in range(last + 1, i):
                    alpha = (x[j] - x[last]) / denom if denom > 0 else 1.0
                    fitted[j] = alpha * fitted[i] + (1 - alpha) * fitted[last]
            last = i
            cut = x[last] + delta
            i = last + 1
            while i < n:
                if x[i] > cut:
                    break
                if x[i] == x[last]:
                    fitted[i] = fitted[last]
                    last = i
                i += 1
            i = max(last + 1, i - 1)
            if last >= n - 1:
                break
        residuals = y - fitted
        if iteration == niter:
            break
        s = np.median(np.abs(residuals))
        if s == 0:
            break
        r = np.clip(np.abs(residuals) / (6.0 * s), 0.0, 1.0)
        rw = (1.0 - r ** 2) ** 2
    return x, fitted
