"""Serial numpy oracle: an independent reimplementation of the reference's
per-gene algorithms (src/DESeq2.cpp), used as the correctness oracle for the
batched TPU kernels and as the single-core CPU baseline in bench.py.

This mirrors the reference test strategy, which validates fitDisp/fitBeta
against R-written loops and optim (tests/testthat/test_betaFitting.R:27-47,
test_dispersions.R:88-125).
"""

from __future__ import annotations

import numpy as np
from scipy.special import digamma, gammaln, polygamma


def nb_logpmf(y, mu, alpha):
    size = 1.0 / alpha
    t = np.where(y > 0, y * (np.log(mu) - np.log(size + mu)), 0.0)
    return (gammaln(y + size) - gammaln(size) - gammaln(y + 1.0)
            + size * (np.log(size) - np.log(size + mu)) + t)


def log_posterior_row(log_alpha, y, mu, x, prior_mean, prior_var, use_prior,
                      weights=None, weight_threshold=1e-2, use_cr=True):
    alpha = np.exp(log_alpha)
    if use_cr:
        w_diag = 1.0 / (1.0 / mu + alpha)
        xs = x
        if weights is not None:
            sel = weights > weight_threshold
            xs = x[sel]
            keep_cols = np.abs(xs).sum(axis=0) > 0
            xs = xs[:, keep_cols]
            w_diag = w_diag[sel]
        b = xs.T @ (xs * w_diag[:, None])
        cr = -0.5 * np.log(np.linalg.det(b))
    else:
        cr = 0.0
    ia = 1.0 / alpha
    terms = (gammaln(y + ia) - gammaln(ia) - y * np.log(mu + ia)
             - ia * np.log(1.0 + mu * alpha))
    ll = np.sum(weights * terms) if weights is not None else np.sum(terms)
    prior = -0.5 * (log_alpha - prior_mean) ** 2 / prior_var if use_prior else 0.0
    return ll + prior + cr


def dlog_posterior_row(log_alpha, y, mu, x, prior_mean, prior_var, use_prior,
                       weights=None, weight_threshold=1e-2, use_cr=True):
    alpha = np.exp(log_alpha)
    if use_cr:
        d = 1.0 / mu + alpha
        w_diag, dw_diag = 1.0 / d, -1.0 / d ** 2
        xs = x
        if weights is not None:
            sel = weights > weight_threshold
            xs = x[sel]
            keep_cols = np.abs(xs).sum(axis=0) > 0
            xs = xs[:, keep_cols]
            w_diag, dw_diag = w_diag[sel], dw_diag[sel]
        b = xs.T @ (xs * w_diag[:, None])
        db = xs.T @ (xs * dw_diag[:, None])
        dcr = -0.5 * np.trace(np.linalg.inv(b) @ db)
    else:
        dcr = 0.0
    ia = 1.0 / alpha
    terms = (digamma(ia) + np.log(1 + mu * alpha)
             - mu * alpha / (1.0 + mu * alpha)
             - digamma(y + ia) + y / (mu + ia))
    s = np.sum(weights * terms) if weights is not None else np.sum(terms)
    ll_part = s / alpha ** 2
    prior = -(log_alpha - prior_mean) / prior_var if use_prior else 0.0
    return (ll_part + dcr) * alpha + prior


def d2log_posterior_row(log_alpha, y, mu, x, prior_mean, prior_var, use_prior,
                        weights=None, weight_threshold=1e-2, use_cr=True):
    alpha = np.exp(log_alpha)
    if use_cr:
        d = 1.0 / mu + alpha
        w_diag, dw_diag, d2w_diag = 1.0 / d, -1.0 / d ** 2, 2.0 / d ** 3
        xs = x
        if weights is not None:
            sel = weights > weight_threshold
            xs = x[sel]
            keep_cols = np.abs(xs).sum(axis=0) > 0
            xs = xs[:, keep_cols]
            w_diag, dw_diag, d2w_diag = w_diag[sel], dw_diag[sel], d2w_diag[sel]
        b = xs.T @ (xs * w_diag[:, None])
        db = xs.T @ (xs * dw_diag[:, None])
        d2b = xs.T @ (xs * d2w_diag[:, None])
        bi = np.linalg.inv(b)
        tr1 = np.trace(bi @ db)
        cr = 0.5 * tr1 ** 2 - 0.5 * (tr1 ** 2 - np.trace(bi @ db @ bi @ db)
                                     + np.trace(bi @ d2b))
    else:
        cr = 0.0
    ia = 1.0 / alpha
    terms1 = (digamma(ia) + np.log(1 + mu * alpha)
              - mu * alpha / (1.0 + mu * alpha)
              - digamma(y + ia) + y / (mu + ia))
    terms2 = (-ia ** 2 * polygamma(1, ia)
              + mu ** 2 * alpha / (1 + mu * alpha) ** 2
              + ia ** 2 * polygamma(1, y + ia)
              + ia ** 2 * y / (mu + ia) ** 2)
    if weights is not None:
        s1, s2 = np.sum(weights * terms1), np.sum(weights * terms2)
    else:
        s1, s2 = np.sum(terms1), np.sum(terms2)
    ll_part = -2.0 / alpha ** 3 * s1 + s2 / alpha ** 2
    dl = dlog_posterior_row(log_alpha, y, mu, x, prior_mean, prior_var, False,
                            weights, weight_threshold, use_cr)
    prior = -1.0 / prior_var if use_prior else 0.0
    return (ll_part + cr) * alpha ** 2 + dl + prior


def fit_disp_serial(y, x, mu, log_alpha, prior_mean, prior_var,
                    min_log_alpha, kappa_0=1.0, tol=1e-6, maxit=100,
                    use_prior=False, weights=None, weight_threshold=1e-2,
                    use_cr=True):
    """Serial per-gene Armijo line search (mirrors src/DESeq2.cpp:163-277)."""
    G = y.shape[0]
    eps = 1.0e-4
    out = dict(log_alpha=np.zeros(G), iter=np.zeros(G, int),
               iter_accept=np.zeros(G, int), last_change=np.zeros(G),
               initial_lp=np.zeros(G), initial_dlp=np.zeros(G),
               last_lp=np.zeros(G), last_dlp=np.zeros(G),
               last_d2lp=np.zeros(G))
    for i in range(G):
        yr, mr = y[i].astype(float), mu[i]
        wr = weights[i] if weights is not None else None
        pm = prior_mean[i]
        args = (yr, mr, x, pm, prior_var, use_prior, wr, weight_threshold,
                use_cr)
        a = log_alpha[i]
        lp = log_posterior_row(a, *args)
        dlp = dlog_posterior_row(a, *args)
        kappa = kappa_0
        out["initial_lp"][i] = lp
        out["initial_dlp"][i] = dlp
        change = -1.0
        for t in range(maxit):
            out["iter"][i] += 1
            a_propose = a + kappa * dlp
            if a_propose < -30.0:
                kappa = (-30.0 - a) / dlp
            if a_propose > 10.0:
                kappa = (10.0 - a) / dlp
            theta_kappa = -log_posterior_row(a + kappa * dlp, *args)
            theta_hat_kappa = -lp - kappa * eps * dlp ** 2
            if theta_kappa <= theta_hat_kappa:
                out["iter_accept"][i] += 1
                a = a + kappa * dlp
                lpnew = log_posterior_row(a, *args)
                change = lpnew - lp
                if change < tol:
                    lp = lpnew
                    break
                if a < min_log_alpha:
                    break
                lp = lpnew
                dlp = dlog_posterior_row(a, *args)
                kappa = min(kappa * 1.1, kappa_0)
                if out["iter_accept"][i] % 5 == 0:
                    kappa = kappa / 2.0
            else:
                kappa = kappa / 2.0
        out["last_lp"][i] = lp
        out["last_dlp"][i] = dlp
        out["last_d2lp"][i] = d2log_posterior_row(a, *args)
        out["log_alpha"][i] = a
        out["last_change"][i] = change
    return out


def fit_beta_serial(y, x, nf, alpha, beta_init, ridge_diag, weights=None,
                    contrast=None, tol=1e-8, maxit=100, min_mu=0.5):
    """Serial per-gene ridge IRLS (mirrors src/DESeq2.cpp:282-465),
    natural-log scale."""
    G, S = y.shape
    p = x.shape[1]
    if contrast is None:
        contrast = np.zeros(p)
    ridge = np.diag(ridge_diag)
    beta_mat = beta_init.copy().astype(float)
    beta_var = np.zeros((G, p))
    hat = np.zeros((G, S))
    iters = np.zeros(G, int)
    dev_out = np.zeros(G)
    cnum = np.zeros(G)
    cden = np.zeros(G)
    for i in range(G):
        yr = y[i].astype(float)
        nfr = nf[i]
        wr = weights[i] if weights is not None else np.ones(S)
        a = alpha[i]
        beta = beta_mat[i].copy()
        mu = np.maximum(nfr * np.exp(x @ beta), min_mu)
        dev, dev_old = 0.0, 0.0
        for t in range(maxit):
            iters[i] += 1
            w = wr * mu / (1.0 + a * mu)
            z = np.log(mu / nfr) + (yr - mu) / mu
            beta = np.linalg.solve(x.T @ (x * w[:, None]) + ridge,
                                   x.T @ (z * w))
            if np.any(np.abs(beta) > 30.0):
                iters[i] = maxit
                break
            mu = np.maximum(nfr * np.exp(x @ beta), min_mu)
            dev = -2.0 * np.sum(wr * nb_logpmf(yr, mu, a))
            conv_test = abs(dev - dev_old) / (abs(dev) + 0.1)
            if np.isnan(conv_test):
                iters[i] = maxit
                break
            if t > 0 and conv_test < tol:
                break
            dev_old = dev
        dev_out[i] = dev
        beta_mat[i] = beta
        w = wr * mu / (1.0 + a * mu)
        A = x.T @ (x * w[:, None]) + ridge
        Ainv = np.linalg.inv(A)
        xw = x * np.sqrt(w)[:, None]
        hat[i] = np.einsum("sp,pq,sq->s", xw, Ainv, xw)
        xtwx = x.T @ (x * w[:, None])
        sigma = Ainv @ xtwx @ Ainv
        beta_var[i] = np.diag(sigma)
        cnum[i] = contrast @ beta
        cden[i] = np.sqrt(contrast @ sigma @ contrast)
    return dict(beta=beta_mat, beta_var=beta_var, iter=iters,
                hat_diag=hat, deviance=dev_out, contrast_num=cnum,
                contrast_denom=cden)
