"""Even/odd slice scaling update (Gauss-Newton, closed form).

Reference: unires/_update.py:270-393 with gradient/Hessian derived
symbolically in derivations/scaling.m:
    gr  = tau * (sum y_-(x_- - y_-) - sum y_+(x_+ - y_+))
    Hes = tau * (sum y_-^2 + sum y_+^2)
where +/- are the exp(+s) (even-index) / exp(-s) (odd-index) slice groups and
y is the projected reconstruction with the CURRENT scaling applied. The
expensive projection (pull + blur) is computed ONCE per observation; the line
search only re-applies the (diagonal) scaling — same trick as the reference
(:312-318 vs :361).

The reference skips CT observations (:286-288).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.proj_op import ProjOp
from ..ops.conv import blur_down_sep
from ..ops.resample import pull
from ..ops.scaling import apply_scaling
from .admm import obs_dyn_args

Array = jax.Array


def _even_odd_masked(dat, msk, axis):
    sl_e = [slice(None)] * 3
    sl_e[axis] = slice(0, None, 2)
    sl_o = [slice(None)] * 3
    sl_o[axis] = slice(1, None, 2)
    return dat[tuple(sl_e)], msk[tuple(sl_e)], dat[tuple(sl_o)], msk[tuple(sl_o)]


def make_scaling_fns(po: ProjOp, method: str):
    """(project, stats, ll) jitted closures for one observation."""
    kers = po.smo_ker_1d
    ratio = po.ratio
    axis = po.dim_thick

    @jax.jit
    def project(y_dat, M):
        """A without scaling: pull + blur (reference :312-316)."""
        out = pull(y_dat, M, po.dim_yx)
        return blur_down_sep(out, kers, ratio)

    @jax.jit
    def stats(dat_y0, dat_x, s, tau):
        """(ll, gr, Hes) at scaling s (y0 = unscaled projection)."""
        dat_y = apply_scaling(dat_y0, s, axis)
        msk = dat_x != 0
        res = jnp.where(msk, dat_x - dat_y, 0.0)
        ll = 0.5 * tau * jnp.sum(res * res)
        ye_p, me_p, yo_m, mo_m = _even_odd_masked(dat_y, msk, axis)
        xe_p, _, xo_m, _ = _even_odd_masked(dat_x, msk, axis)
        # groups: '+' = even index = exp(+s); '-' = odd index = exp(-s)
        sp = jnp.sum(jnp.where(me_p, ye_p * (xe_p - ye_p), 0.0))
        sm = jnp.sum(jnp.where(mo_m, yo_m * (xo_m - yo_m), 0.0))
        gr = tau * (sm - sp)
        hes = tau * (jnp.sum(jnp.where(me_p, ye_p * ye_p, 0.0))
                     + jnp.sum(jnp.where(mo_m, yo_m * yo_m, 0.0)))
        return ll, gr, hes

    @jax.jit
    def ll_at(dat_y0, dat_x, s, tau):
        dat_y = apply_scaling(dat_y0, s, axis)
        msk = dat_x != 0
        res = jnp.where(msk, dat_x - dat_y, 0.0)
        return 0.5 * tau * jnp.sum(res * res)

    return project, stats, ll_at


def update_scaling(x, y, sett, max_niter_gn: int = 1, num_linesearch: int = 6,
                   fns_cache: dict | None = None):
    """Update po.scl for every non-CT observation. Returns (x, sum ll).

    Host-driven line search over a device scalar (reference :320-387); the
    projection is computed once per observation per call.
    """
    sll = 0.0
    for c in range(len(x)):
        for n, o in enumerate(x[c]):
            if o.ct:
                continue
            key = (c, n)
            if fns_cache is not None and key in fns_cache:
                project, stats, ll_at = fns_cache[key]
            else:
                project, stats, ll_at = make_scaling_fns(o.po, sett.method)
                if fns_cache is not None:
                    fns_cache[key] = (project, stats, ll_at)
            from ..geometry import expm

            rigid = expm(o.rigid_q, sett.rigid_basis) if o.rigid_q is not None else o.po.rigid
            M, _ = obs_dyn_args(o.po, "super-resolution", rigid)
            dat_y0 = project(y[c].dat, M)
            tau = jnp.float32(o.tau)
            scl = float(o.po.scl)
            ll = None
            for _ in range(max_niter_gn):
                ll, gr, hes = stats(dat_y0, o.dat, jnp.float32(scl), tau)
                ll = float(ll)
                update = float(gr) / max(float(hes), 1e-30)
                old_scl, old_ll = scl, ll
                armijo = 1.0
                if num_linesearch == 0:
                    scl = old_scl - armijo * update
                else:
                    for _ls in range(num_linesearch):
                        cand = old_scl - armijo * update
                        cand_ll = float(ll_at(dat_y0, o.dat, jnp.float32(cand), tau))
                        if cand_ll < old_ll:
                            scl, ll = cand, cand_ll
                            break
                        armijo *= 0.5
                    else:
                        scl, ll = old_scl, old_ll
            o.po.scl = float(scl)
            sll += float(ll)
    return x, sll
