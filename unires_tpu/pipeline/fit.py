"""Fit orchestrator: the outer ADMM loop with coarse-to-fine scheduling.

Mirrors the reference ``fit`` (unires/run.py:24-207): lambda schedule with
countdowns and minimum-iteration guards, gain-based convergence, optional
even/odd scaling and unified-rigid updates, FOV cleaning and rigid-matrix
collection. Control flow is host-side (tiny scalars); each iteration's dense
work is ONE jitted device step (solvers.admm.make_admm_step).
"""
from __future__ import annotations

import os
from timeit import default_timer as timer
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import expm, voxel_size
from ..solvers.admm import admm_aux, make_admm_step, obs_dyn_args, step_size
from ..solvers.rigid import update_rigid
from ..solvers.scaling_gn import update_scaling
from ..utils.log import info
from .structs import XData, YData


def get_gain(obj_trace) -> float:
    """Relative gain of the last step (nitorch get_gain, run.py:100)."""
    v = np.asarray(obj_trace, dtype=np.float64)
    if v.size < 2:
        return float("inf")
    denom = v.max() - v.min()
    if denom == 0:
        return 0.0
    return float((v[-2] - v[-1]) / denom)


def get_sched(N: int, sett):
    """Coarse-to-fine lambda schedule (reference _core.py:288-307)."""
    if sett.sched_num < 0 or N == 1:
        sett.sched_num = 0
    if sett.rigid_mod < 1:
        sett.rigid_mod = 1
    scl = np.atleast_1d(np.asarray(sett.reg_scl, dtype=np.float32))
    if scl.size > 1:
        # explicit schedule given by the user
        sett.reg_scl = scl
        return sett
    sched = 2.0 ** np.arange(31, -1, -1, dtype=np.float32)
    ix = int(np.argmin(np.abs(sched - scl[0])))
    sched = sched[max(ix - sett.sched_num, 0):ix]
    sett.reg_scl = np.concatenate([sched, scl.reshape(1)])
    return sett


def _gather_dyn(x, sett):
    """Dynamic per-observation operands for the jitted step."""
    Ms, Minvs, scls, taus = [], [], [], []
    for c in range(len(x)):
        Ms_c, Mi_c, s_c, t_c = [], [], [], []
        for o in x[c]:
            rigid = o.po.rigid
            M, Minv = obs_dyn_args(o.po, sett.method, rigid)
            Ms_c.append(M)
            Mi_c.append(Minv)
            s_c.append(jnp.float32(o.po.scl))
            t_c.append(jnp.float32(o.tau))
        Ms.append(tuple(Ms_c))
        Minvs.append(tuple(Mi_c))
        scls.append(tuple(s_c))
        taus.append(tuple(t_c))
    return tuple(Ms), tuple(Minvs), tuple(scls), tuple(taus)


def fit(x: XData, y: YData, sett):
    """Run the iterative solver; returns (y, R, jtv, obj_trace, n_iter).

    Output writing is the caller's job (pipeline.run handles I/O), keeping
    this function free of host I/O so it can be benchmarked cleanly.
    """
    N = sum(len(xc) for xc in x)
    C = len(x)
    sett = get_sched(N, sett)

    # schedule position 0
    cnt_scl = 0
    for c in range(C):
        y[c].lam = float(sett.reg_scl[cnt_scl]) * y[c].lam0

    jtv = None
    obj_trace = []
    R = np.stack([np.eye(4)] * N)
    start_iter = 0
    if sett.max_iter > 0:
        rho = step_size(x, y, sett)
        info(sett, "step-size", rho)
        z, w = admm_aux(C, y[0].dim)
        cnt_scl_iter = 0
        countdown0 = 6
        countdown1 = 6

        if sett.resume and sett.checkpoint_path and \
                os.path.exists(sett.checkpoint_path):
            from .checkpoint import load_checkpoint, restore_into

            z, w, st = restore_into(load_checkpoint(sett.checkpoint_path), x, y)
            rho = st["rho"]
            cnt_scl = st["cnt_scl"]
            cnt_scl_iter = st["cnt_scl_iter"]
            countdown0 = st["countdown0"]
            countdown1 = st["countdown1"]
            obj_trace = st["obj_trace"]
            start_iter = st["n_iter"] + 1

        step = make_admm_step(x, y, sett)
        xdats = tuple(tuple(o.dat for o in xc) for xc in x)
        ys = jnp.stack([yc.dat for yc in y])

        scaling_cache: dict = {}
        rigid_cache: dict = {}

        t00 = info(sett, "fit-start", C, N)
        t_iter = timer()
        n_iter = start_iter
        geometry_dirty = True
        lam_dirty = True
        Ms = Minvs = scls = taus = None
        lams = rho_j = None
        for n_iter in range(start_iter, sett.max_iter):
            if geometry_dirty:
                Ms, Minvs, scls, taus = _gather_dyn(x, sett)
                geometry_dirty = False
            if lam_dirty:  # uploads cost ~30 ms each over a device tunnel
                lams = jnp.asarray([y[c].lam for c in range(C)], jnp.float32)
                rho_j = jnp.float32(rho)
                lam_dirty = False

            ys, z, w, jtv, obj = step(ys, z, w, xdats, Ms, Minvs, scls, taus,
                                      lams, rho_j)
            obj_trace.append(np.asarray(obj, np.float64))

            gain = get_gain([o[0] for o in obj_trace])
            t_iter = info(sett, "fit-ll", n_iter, obj_trace[-1], gain, t_iter)

            # optional dashboards (reference run.py:90-99)
            if sett.plot_conv:
                from ..utils.plots import plot_convergence

                plot_convergence(np.asarray(obj_trace))
            if sett.show_jtv and jtv is not None:
                from ..utils.plots import show_slices

                show_slices(np.asarray(jtv), title="JTV", fig_num=98,
                            cmap="coolwarm")

            # -- converged? (reference run.py:103-110) --
            if (cnt_scl >= len(sett.reg_scl) - 1 and cnt_scl_iter > 20
                    and (abs(gain) < sett.tolerance or n_iter >= sett.max_iter - 1)):
                countdown0 -= 1
                if countdown0 == 0:
                    info(sett, "fit-finish", t00, n_iter)
                    break
            else:
                countdown0 = 6

            # -- even/odd scaling update (reference run.py:115-122) --
            if sett.scaling:
                for c in range(C):
                    y[c].dat = ys[c]
                x, _ = update_scaling(x, y, sett, max_niter_gn=1,
                                      num_linesearch=6, fns_cache=scaling_cache)
                info(sett, "scl-param", x)
                geometry_dirty = True

            # -- rigid update (reference run.py:127-135) --
            if sett.unified_rigid and n_iter > 0 and (n_iter % sett.rigid_mod) == 0:
                for c in range(C):
                    y[c].dat = ys[c]
                x, _ = update_rigid(x, y, sett, mean_correct=False,
                                    max_niter_gn=1, num_linesearch=6,
                                    samp=sett.rigid_samp, fns_cache=rigid_cache)
                info(sett, "reg-param", x)
                geometry_dirty = True

            # -- coarse-to-fine lambda schedule (reference run.py:140-155) --
            if (cnt_scl + 1 < len(sett.reg_scl) and cnt_scl_iter > 16
                    and abs(gain) < 1e-3):
                countdown1 -= 1
                if countdown1 == 0:
                    cnt_scl_iter = 0
                    cnt_scl += 1
                    oreg = y[0].lam
                    for c in range(C):
                        y[c].lam = float(sett.reg_scl[cnt_scl]) * y[c].lam0
                    rho = step_size(x, y, sett)
                    lam_dirty = True
                    info(sett, "reg-change", oreg, y[0].lam)
                    countdown1 = 6
            else:
                countdown1 = 6

            cnt_scl_iter += 1

            # -- checkpoint (SURVEY §5 rebuild note; not in the reference) --
            if (sett.checkpoint_every > 0 and sett.checkpoint_path
                    and (n_iter + 1) % sett.checkpoint_every == 0):
                from .checkpoint import save_checkpoint

                for c in range(C):
                    y[c].dat = ys[c]
                save_checkpoint(sett.checkpoint_path, x, y, z, w, dict(
                    rho=rho, cnt_scl=cnt_scl, cnt_scl_iter=cnt_scl_iter,
                    n_iter=n_iter, countdown0=countdown0,
                    countdown1=countdown1, obj_trace=np.asarray(obj_trace)))

        for c in range(C):
            y[c].dat = ys[c]

    # -- clean FOV (reference run.py:162-187) --
    if sett.clean_fov:
        from ..ops.resample import pull

        for c in range(C):
            msk = jnp.ones(y[c].dim, bool)
            for o in x[c]:
                Minv = np.linalg.inv(
                    np.linalg.solve(y[c].mat, o.po.rigid @ o.mat))
                M = jnp.asarray(Minv[:3, :4].astype(np.float32))
                ones = jnp.ones(o.dim, jnp.float32)
                inside = pull(ones, M, y[c].dim, order=0) > 0
                msk = msk & inside
            y[c].dat = jnp.where(msk, y[c].dat, 0.0)

    # -- rigid matrices (reference run.py:195-200) --
    cnt = 0
    for c in range(C):
        for o in x[c]:
            if o.rigid_q is not None and sett.rigid_basis is not None:
                R[cnt] = expm(o.rigid_q, sett.rigid_basis)
            cnt += 1

    n_done = len(obj_trace)
    return y, R, jtv, np.asarray(obj_trace) if obj_trace else np.zeros((0, 3)), n_done
