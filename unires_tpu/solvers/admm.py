"""The ADMM solver for the multi-channel JTV MAP problem.

TPU-first re-design of the reference hot loop (unires/_update.py:105-195 and
:396-427):

  * ONE jitted function computes the whole outer iteration — y-updates for all
    channels (CG as a device-side while_loop), the objective, the joint
    shrinkage z-update and the dual w-update — so XLA fuses all elementwise
    work and nothing bounces to host except the (3,) objective used for the
    convergence test (reference does all control flow on host each iteration).
  * Channel and repeat loops are unrolled at trace time (C, N are small and
    static); volumes are stacked (C, *dim_y) so z/w updates are vmapped.
  * Dynamic inputs: volumes, the per-observation (3,4) maps M / M^{-1}
    (they change when rigid poses update), scaling scalars, tau, lam, rho.
    Geometry (dims, kernels, ratios, push windows) is static in the trace.
  * The objective is accumulated with compensated f32 reductions
    (ops.reductions.stable_sum) matching the reference's f64 accumulation
    quality (unires/run.py:74) without paying TPU-emulated f64.

``make_admm_body`` exposes the un-jitted iteration body so the chunked fit
loop (solvers.fitloop) can run K iterations per device call; ``make_admm_step``
wraps it as the standalone jitted single-iteration step.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..models.forward import make_obs_ops, obs_dyn_args  # noqa: F401 (re-export)
from ..ops.finite_diff import im_divergence, im_gradient
from ..ops.reductions import stable_sum
from .cg import cg, cg_batched  # noqa: F401 (cg re-exported for callers)

Array = jax.Array


# ---------------------------------------------------------------------------
# Step-size / aux (host helpers; reference unires/_update.py:17-64)
# ---------------------------------------------------------------------------

def admm_aux(C: int, dim_y) -> tuple:
    shape = (C, 3) + tuple(dim_y)
    return jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32)


def step_size(x, y, sett) -> float:
    """rho = rho_scl * sqrt(mean tau) / mean lam; 1.0 for CT (ref :35-64)."""
    if any(o.ct for c in x for o in c):
        return 1.0
    if sett.rho is not None:
        return float(sett.rho)
    taus = [o.tau for c in x for o in c]
    lams = [c.lam for c in y]
    return float(sett.rho_scl) * float(np.sqrt(np.mean(taus)) / np.mean(lams))


# ---------------------------------------------------------------------------
# The (un-jitted) outer-iteration body, reusable inside a scanned chunk
# ---------------------------------------------------------------------------

def fourier_membrane_eigs(dim_y, vx_y) -> jnp.ndarray:
    """rfftn eigenvalues of the membrane/TV-quadratic D^T D term.

    The CG normal matrix is  sum_n tau_n A^T A + rho lam^2 D^T D. The
    membrane term is (up to boundary rows) circulant, hence diagonal in
    Fourier space with eigenvalues sum_d 4 sin^2(pi k_d / n_d) / vx_d^2;
    the data term is approximated by its mean diagonal (the reference's
    exact-diagonal variant exists but is disabled,
    unires/_update.py:80-102,136-137 — the spectral version is the
    BASELINE.json north-star and cuts CG iterations ~3-4x).
    """
    dim_y = tuple(int(d) for d in dim_y)
    lamD = np.zeros(dim_y, np.float32)
    for d in range(3):
        k = np.arange(dim_y[d])
        e = (4.0 / float(vx_y[d]) ** 2) * np.sin(np.pi * k / dim_y[d]) ** 2
        shape = [1, 1, 1]
        shape[d] = dim_y[d]
        lamD = lamD + e.reshape(shape).astype(np.float32)
    return jnp.asarray(lamD[..., : dim_y[2] // 2 + 1])


def dct_matrices(dim_y):
    """Per-axis orthonormal DCT-II matrices (host f64, stored f32).

    XLA's TPU FFT at the non-power-of-2 volume sizes this pipeline sees
    (181, 217, ...) generates ENORMOUS programs — measured 35.6 MB of TPU
    code and 188 s of compile for ONE rfftn/irfftn pair at 181x217x181,
    which made the round-2 fit chunk a ~312 MB executable costing ~90 s of
    per-process load (VERDICT round-2 item 1). The DCT preconditioner below
    replaces it with six dense (n, n) matmuls — MXU-native, ~0.1 MB of code,
    and it diagonalises the membrane term with Neumann boundary (a better
    match for the zero-gradient FOV edge than the circulant/FFT version).
    """
    out = []
    for n in dim_y:
        n = int(n)
        k = np.arange(n)[:, None]
        i = np.arange(n)[None, :]
        C = np.cos(np.pi * (i + 0.5) * k / n) * np.sqrt(2.0 / n)
        C[0] /= np.sqrt(2.0)
        out.append(jnp.asarray(C.astype(np.float32)))
    return out


def dct_membrane_eigs(dim_y, vx_y) -> jnp.ndarray:
    """DCT-II eigenvalues of the Neumann-boundary membrane operator:
    sum_d 4 sin^2(pi k_d / (2 n_d)) / vx_d^2, full (X, Y, Z) grid."""
    dim_y = tuple(int(d) for d in dim_y)
    lamD = np.zeros(dim_y, np.float32)
    for d in range(3):
        k = np.arange(dim_y[d])
        e = (4.0 / float(vx_y[d]) ** 2) * np.sin(
            np.pi * k / (2.0 * dim_y[d])) ** 2
        shape = [1, 1, 1]
        shape[d] = dim_y[d]
        lamD = lamD + e.reshape(shape).astype(np.float32)
    return jnp.asarray(lamD)


def dct_membrane_tables(dim_y):
    """Per-axis DCT-II membrane tables 4 sin^2(pi k / (2 n)), broadcast-ready
    ((X,1,1), (1,Y,1), (1,1,Z)).  The full-grid eigenvalue field is
    ``sum_d tables[d] / vx_d^2`` — computed ON THE FLY inside the
    preconditioner, so no dim_y-sized constant (28 MB at 181x217x181) is
    baked into the executable and vx can be a traced operand."""
    dim_y = tuple(int(d) for d in dim_y)
    out = []
    for d in range(3):
        k = np.arange(dim_y[d])
        e = (4.0 * np.sin(np.pi * k / (2.0 * dim_y[d])) ** 2).astype(np.float32)
        shape = [1, 1, 1]
        shape[d] = dim_y[d]
        out.append(jnp.asarray(e.reshape(shape)))
    return tuple(out)


def jacobi_tables(dim_y):
    """Per-axis per-voxel diagonal of D^T D for forward differences,
    broadcast-ready ((X,1,1), (1,Y,1), (1,1,Z)).

    Voxel i contributes to the forward difference at i (unless last) and at
    i-1 (unless first), so diag(D_d^T D_d)[i] = ([i < n-1] + [i > 0]) before
    the 1/vx_d^2 factor. This is the exact diagonal the reference's
    (shipped-but-disabled) Jacobi-style ``_precond`` approximates
    (unires/_update.py:80-102); exposed via Settings.precond='jacobi' for
    A/B parity runs against the DCT preconditioner.
    """
    dim_y = tuple(int(d) for d in dim_y)
    out = []
    for d in range(3):
        n = dim_y[d]
        e = np.full(n, 2.0, np.float32)
        e[0] = 1.0
        e[-1] = 1.0
        shape = [1, 1, 1]
        shape[d] = n
        out.append(jnp.asarray(e.reshape(shape)))
    return tuple(out)


def make_cdiag_fn(x, sett) -> Callable:
    """Device fn: per-channel data-term diagonal for the CG preconditioner.

    cdiags(Ms, Minvs, scls, taus) -> (C,) f32 with
    cdiag_c = sum_n tau_cn * mean(AtA_cn(1)); recomputable on device so the
    preconditioner tracks rigid-pose drift (round-1 VERDICT weak item 8:
    the frozen trace-time diagonal goes stale under large rigid moves).
    """
    C = len(x)
    method = sett.method
    do_proj = sett.do_proj
    dim_y = tuple(int(d) for d in x[0][0].po.dim_y)
    ops = [[make_obs_ops(o.po, method) for o in x[c]] for c in range(C)]
    ones = jnp.ones(dim_y, jnp.float32)

    def cdiags(Ms, Minvs, scls, taus):
        out = []
        for c in range(C):
            acc = jnp.float32(0.0)
            for n in range(len(x[c])):
                if do_proj:
                    _, _, AtA = ops[c][n]
                    ata1 = AtA(ones, Ms[c][n], Minvs[c][n], scls[c][n])
                    acc = acc + taus[c][n] * jnp.mean(ata1)
                else:
                    acc = acc + taus[c][n]
            out.append(acc)
        return jnp.stack(out)

    return cdiags


def make_admm_body(x, y, sett):
    """Un-jitted single ADMM iteration body for this problem's geometry.

    Returns ``body(ys, z, w, xdats, Ms, Minvs, scls, taus, lams, rho, cdiags)
    -> (ys, z, w, jtv, obj)`` with obj (3,) f32 =
    (-ln p(y|x), -ln p(x|y), -ln p(y)) — reference _compute_nll
    (unires/_update.py:396-427) and _update_admm (:105-195).
    """
    C = len(x)
    method = sett.method
    do_proj = sett.do_proj
    diff = sett.diff
    vx_y = tuple(np.sqrt((np.asarray(y[0].mat, np.float64)[:3, :3] ** 2)
                         .sum(0)).astype(np.float32))
    alpha = float(sett.alpha)
    cg_iter = int(sett.cgs_max_iter)
    cg_tol = float(sett.cgs_tol)
    tiny = 1e-7
    dim_y = tuple(int(d) for d in y[0].dim)

    ops = [[make_obs_ops(o.po, method) for o in x[c]] for c in range(C)]
    # preconditioner mode: Settings.precond in {'dct','jacobi','none'}
    # (reference parity: its Jacobi-style _precond ships disabled,
    # unires/_update.py:80-102 — 'jacobi' reproduces it for A/B runs, 'dct'
    # is this rebuild's default and supersedes it); the UNIRES_TPU_PRECOND
    # env var stays as a settings-free bisect override.
    import os as _os

    precond_mode = _os.environ.get(
        "UNIRES_TPU_PRECOND", getattr(sett, "precond", "dct") or "dct")
    if precond_mode in ("0",):
        precond_mode = "none"
    if precond_mode not in ("dct", "jacobi", "none"):
        raise ValueError(f"precond={precond_mode!r} (use dct|jacobi|none)")
    Cx, Cy, Cz = dct_matrices(dim_y)
    eig_tabs = dct_membrane_tables(dim_y)
    jac_tabs = jacobi_tables(dim_y)
    hi = jax.lax.Precision.HIGHEST

    X, Y, Z = dim_y
    Cn = len(x)

    def _dct_apply(V, Mx, My, Mz):
        # per-axis transform as swapaxes+reshape+MATMUL: einsum's lowering
        # of the same contractions compiled to ~44 MB of TPU code per
        # instance at odd dims (transpose-fusion bloat; measured 126 MB for
        # the 6-matmul chain) — this formulation compiles to 7.5 MB and
        # runs the same speed
        t = V.swapaxes(1, 3).reshape(-1, X)
        t = jnp.matmul(t, Mx, precision=hi).reshape(Cn, Z, Y, X).swapaxes(1, 3)
        t = t.swapaxes(2, 3).reshape(-1, Y)
        t = jnp.matmul(t, My, precision=hi).reshape(Cn, X, Z, Y).swapaxes(2, 3)
        t = t.reshape(-1, Z)
        return jnp.matmul(t, Mz, precision=hi).reshape(Cn, X, Y, Z)

    def make_precond_batched(cdiags_c, rho, lams_c, vx):
        # diagonal-in-DCT-basis inverse of  cdiag + rho lam^2 D^T D  for ALL
        # channels at once — six (n, n) matmuls on the MXU with the channel
        # axis batched into them (see dct_matrices for why not FFT).
        if precond_mode == "none":
            return None
        if precond_mode == "jacobi":
            # voxel-diagonal inverse of cdiag + rho lam^2 diag(D^T D)
            jacD = (jac_tabs[0] / (vx[0] * vx[0])
                    + jac_tabs[1] / (vx[1] * vx[1])
                    + jac_tabs[2] / (vx[2] * vx[2]))
            denom_j = (cdiags_c[:, None, None, None]
                       + rho * (lams_c * lams_c)[:, None, None, None] * jacD)
            return lambda V: V / denom_j
        lamD = (eig_tabs[0] / (vx[0] * vx[0])
                + eig_tabs[1] / (vx[1] * vx[1])
                + eig_tabs[2] / (vx[2] * vx[2]))
        denom = (cdiags_c[:, None, None, None]
                 + rho * (lams_c * lams_c)[:, None, None, None] * lamD)

        def P(V):
            t = _dct_apply(V, Cx.T, Cy.T, Cz.T)
            t = t / denom
            return _dct_apply(t, Cx, Cy, Cz)

        return P

    def body(ys, z, w, xdats, Ms, Minvs, scls, taus, lams, rho, cdiags,
             vx=None):
        if vx is None:
            vx = jnp.asarray(vx_y, jnp.float32)

        def grad_c(yc, lam):
            return lam * im_gradient(yc, vx, diff)
        # ---- y-update: ALL channels in ONE batched CG. Channel solves are
        # independent (per-channel alpha/beta, converged channels frozen —
        # trajectories identical to separate CGs), but batching means the
        # compiled program holds ONE preconditioner instance instead of
        # 2 x C (it compiles to ~40 MB of TPU matmul code; the per-channel
        # version made the round-2 fit chunk a ~312 MB executable costing
        # ~90 s of per-process load) and the DCT matmuls amortise over C ----
        lams = jnp.asarray(lams, jnp.float32)  # tolerate tuple callers
        rhs_all = []
        for c in range(C):
            lam = lams[c]
            rhs = jnp.zeros_like(ys[c])
            for n in range(len(x[c])):
                A, At, AtA = ops[c][n]
                if do_proj:
                    rhs = rhs + taus[c][n] * At(xdats[c][n], Ms[c][n],
                                                Minvs[c][n], scls[c][n])
                else:
                    rhs = rhs + taus[c][n] * xdats[c][n]
            div = im_divergence(w[c] - rho * z[c], vx, diff)
            rhs_all.append(rhs - lam * div)
        rhs_all = jnp.stack(rhs_all)

        def lhs_all(V):
            outs = []
            for c in range(C):
                lam = lams[c]
                out = rho * lam * lam * im_divergence(
                    im_gradient(V[c], vx, diff), vx, diff)
                for n in range(len(x[c])):
                    A, At, AtA = ops[c][n]
                    if do_proj:
                        out = out + taus[c][n] * AtA(V[c], Ms[c][n],
                                                     Minvs[c][n], scls[c][n])
                    else:
                        out = out + taus[c][n] * V[c]
                outs.append(out)
            return jnp.stack(outs)

        precond = make_precond_batched(cdiags, rho, lams, vx)
        # residual stop: the preconditioner converges CG in ~3-5 cold
        # iterations, and warm-started solves exit immediately (the
        # reference's max_gain criterion always runs max_iter).
        # tol: residual AMPLITUDE ratio; 3x the gain tol matches the
        # accuracy of the reference's 20-iteration solves — lazier solves
        # (10x) cost MORE wall-clock overall: outer iterations grow faster
        # than the saved CG steps (103 -> 97 outer iters and -23% wall
        # measured on the CPU bench fixture when tightening 10x -> 3x)
        ys = cg_batched(lhs_all, rhs_all, ys, max_iter=cg_iter,
                        tol=3.0 * cg_tol, precond=precond,
                        verbose=bool(sett.cgs_verbose))

        # ---- objective (reference _compute_nll, :396-427; f64-quality
        # accumulation via compensated f32 reductions) ----
        nll_xy = jnp.float32(0.0)
        for c in range(C):
            for n in range(len(x[c])):
                A, At, AtA = ops[c][n]
                if do_proj:
                    Ay = A(ys[c], Ms[c][n], Minvs[c][n], scls[c][n])
                else:
                    Ay = ys[c]
                msk = xdats[c][n] != 0
                res = jnp.where(msk, xdats[c][n] - Ay, 0.0)
                nll_xy = nll_xy + 0.5 * taus[c][n] * stable_sum(res * res)

        # ---- gradients for z/w (and the JTV prior term of the objective) ----
        Dys = jax.vmap(grad_c)(ys, lams)  # (C, 3, *dim_y)
        nll_y = stable_sum(jnp.sqrt(jnp.sum(Dys * Dys, axis=(0, 1))))

        if alpha != 1.0:  # over/under-relaxation (reference :163-190)
            Dys_rel = alpha * Dys + (1.0 - alpha) * z
        else:
            Dys_rel = Dys

        # ---- z-update: multi-channel group shrinkage (reference :163-181) ----
        u = w / rho + Dys_rel
        mag = jnp.sqrt(jnp.sum(u * u, axis=(0, 1)))
        shrink = jnp.maximum(mag - 1.0 / rho, 0.0) / (mag + tiny)
        z = shrink[None, None] * u

        # ---- w-update: dual ascent (reference :186-193) ----
        w = w + rho * (Dys_rel - z)

        obj = jnp.stack([nll_xy + nll_y, nll_xy, nll_y])
        return ys, z, w, shrink, obj

    return body


# ---------------------------------------------------------------------------
# The jitted single-iteration step (kept for tests / sharding / back-compat)
# ---------------------------------------------------------------------------

def make_admm_step(x, y, sett) -> Callable:
    """Build the jitted ADMM iteration for this problem's static geometry.

    Returned signature:
        step(ys, z, w, xdats, Ms, Minvs, scls, taus, lams, rho)
          -> (ys, z, w, jtv, obj)
    with ys (C,*dim_y); z/w (C,3,*dim_y); nested tuples for per-observation
    args; obj (3,) f32 = (-ln p(y|x), -ln p(x|y), -ln p(y)).
    """
    C = len(x)
    body = make_admm_body(x, y, sett)

    # per-observation mean diagonal of A^T A (unit tau), from the nominal map
    # (the chunked fit loop recomputes this on device; here it is frozen at
    # build time, which is fine for the step's test/demo usage)
    method = sett.method
    do_proj = sett.do_proj
    dim_y = tuple(int(d) for d in y[0].dim)
    ops = [[make_obs_ops(o.po, method) for o in x[c]] for c in range(C)]
    c_unit = []
    for c in range(C):
        row = []
        for n in range(len(x[c])):
            A, At, AtA = ops[c][n]
            M0, Mi0 = obs_dyn_args(x[c][n].po, method)
            if do_proj:
                ata1 = AtA(jnp.ones(dim_y, jnp.float32), M0, Mi0,
                           jnp.float32(x[c][n].po.scl))
                row.append(float(jnp.mean(ata1)))
            else:
                row.append(1.0)
        c_unit.append(row)

    def step(ys, z, w, xdats, Ms, Minvs, scls, taus, lams, rho):
        cdiags = []
        for c in range(C):
            acc = jnp.float32(0.0)
            for n in range(len(x[c])):
                acc = acc + taus[c][n] * c_unit[c][n]
            cdiags.append(acc)
        cdiags = jnp.stack(cdiags)
        return body(ys, z, w, xdats, Ms, Minvs, scls, taus, lams, rho, cdiags)

    return jax.jit(step, donate_argnums=(0, 1, 2))


def make_compute_nll(x, y, sett) -> Callable:
    """Standalone objective (used at iteration 0 / for diagnostics)."""
    C = len(x)
    method = sett.method
    do_proj = sett.do_proj
    diff = sett.diff
    vx_y = tuple(np.sqrt((np.asarray(y[0].mat, np.float64)[:3, :3] ** 2)
                         .sum(0)).astype(np.float32))
    ops = [[make_obs_ops(o.po, method) for o in x[c]] for c in range(C)]

    def nll(ys, xdats, Ms, Minvs, scls, taus, lams):
        nll_xy = jnp.float32(0.0)
        for c in range(C):
            for n in range(len(x[c])):
                A, _, _ = ops[c][n]
                Ay = A(ys[c], Ms[c][n], Minvs[c][n], scls[c][n]) if do_proj else ys[c]
                msk = xdats[c][n] != 0
                res = jnp.where(msk, xdats[c][n] - Ay, 0.0)
                nll_xy = nll_xy + 0.5 * taus[c][n] * stable_sum(res * res)
        Dys = jax.vmap(lambda yc, lam: lam * im_gradient(yc, vx_y, diff))(ys, lams)
        nll_y = stable_sum(jnp.sqrt(jnp.sum(Dys * Dys, axis=(0, 1))))
        return jnp.stack([nll_xy + nll_y, nll_xy, nll_y])

    return jax.jit(nll)
