"""Data-driven hyper-parameter estimation.

Re-implements the behavior of nitorch.tools.img_statistics.estimate_noise as
used by the reference (unires/_core.py:96-142): fit a 2-class intensity
mixture (background/noise vs foreground) per observation, and set
    sd  = background std, tau = 1/sd^2, mu = |mean_fg - mean_bg|.
Non-CT data is restricted to non-negative intensities first (:119-121).

Implementation: the histogram is computed on device (one pass over the
volume); the 2-class Gaussian-mixture EM runs on the 1024-bin histogram on
host (float64, microseconds). This keeps host<->device traffic to 1024 floats
per observation.
"""
from __future__ import annotations

from timeit import default_timer as timer

import jax.numpy as jnp
import numpy as np

from ..utils.log import info


def fit_gmm2(centers: np.ndarray, counts: np.ndarray, max_iter: int = 1000,
             tol: float = 1e-8):
    """2-class 1D GMM EM on binned data. Returns (means, sds, weights)."""
    centers = np.asarray(centers, np.float64)
    counts = np.asarray(counts, np.float64)
    tot = counts.sum()
    if tot <= 0:
        return np.array([0.0, 1.0]), np.array([1.0, 1.0]), np.array([0.5, 0.5])
    # init: split mass at the median
    cdf = np.cumsum(counts) / tot
    med = centers[np.searchsorted(cdf, 0.5)]
    lo = counts * (centers <= med)
    hi = counts * (centers > med)

    def mom(w):
        s = w.sum()
        if s <= 0:
            return centers.mean(), centers.std() + 1e-3, 1e-9
        m = (w * centers).sum() / s
        v = (w * (centers - m) ** 2).sum() / s
        return m, np.sqrt(max(v, 1e-12)), s / tot

    m1, s1, p1 = mom(lo)
    m2, s2, p2 = mom(hi)
    ll_old = -np.inf
    for _ in range(max_iter):
        # E-step (in log space for stability)
        def logpdf(m, s):
            return -0.5 * ((centers - m) / s) ** 2 - np.log(s) - 0.918938533
        l1 = np.log(max(p1, 1e-30)) + logpdf(m1, s1)
        l2 = np.log(max(p2, 1e-30)) + logpdf(m2, s2)
        mx = np.maximum(l1, l2)
        lse = mx + np.log(np.exp(l1 - mx) + np.exp(l2 - mx))
        r1 = np.exp(l1 - lse)
        ll = (counts * lse).sum() / tot
        # M-step
        m1, s1, p1 = mom(counts * r1)
        m2, s2, p2 = mom(counts * (1.0 - r1))
        if abs(ll - ll_old) < tol * max(1.0, abs(ll)):
            break
        ll_old = ll
    means = np.array([m1, m2])
    sds = np.array([s1, s2])
    ps = np.array([p1, p2])
    return means, sds, ps


def estimate_noise(dat, is_ct: bool = False, bins: int = 1024):
    """(sd_bg, mean_bg, sd_fg, mean_fg) of the 2-class intensity fit."""
    # histogram on host: one device->host pull of the volume; jnp.histogram
    # lowers to scatter on TPU and is catastrophically slow (observed 400+ s
    # for a 64^3 volume on v5e)
    v = np.asarray(dat).ravel()
    if not is_ct:
        v = v[v >= 0]
    if v.size == 0:
        return 1.0, 0.0, 1.0, 1.0
    vmin = float(v.min())
    vmax = float(v.max())
    if not np.isfinite(vmin) or vmax <= vmin:
        return 1.0, 0.0, 1.0, 1.0
    counts, edges = np.histogram(v, bins=bins, range=(vmin, vmax))
    counts = np.asarray(counts, np.float64)
    centers = 0.5 * (edges[:-1] + edges[1:])
    means, sds, _ = fit_gmm2(centers, counts)
    bg = int(np.argmin(means))
    fg = 1 - bg
    # guard against a collapsed background class (e.g. heavily zero-inflated
    # data): tau = 1/sd^2 must stay finite and sane
    sd_floor = max(1e-6 * (vmax - vmin), 1e-12)
    return (float(max(sds[bg], sd_floor)), float(means[bg]),
            float(max(sds[fg], sd_floor)), float(means[fg]))


def estimate_hyperpar(x, sett):
    """Set sd/tau/mu on every observation (reference _core.py:96-142)."""
    t0 = info(sett, "hyper-start")
    for c in range(len(x)):
        for o in x[c]:
            sd_bg, mu_bg, sd_fg, mu_fg = estimate_noise(o.dat, is_ct=o.ct)
            o.sd = float(sd_bg)
            o.tau = float(1.0 / sd_bg ** 2)
            o.mu = float(abs(mu_fg - mu_bg))
    info(sett, "hyper-done", x, t0)
    return x
