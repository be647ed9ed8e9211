"""Unified rigid registration update (Gauss-Newton on SE(3) pose).

Reference: unires/_update.py:198-267 (driver) and :448-710 (per-channel GN
with matching term, chain rule and Armijo line search).

TPU-first redesign of the chain rule: the reference materialises 18 dAff
volumes (6 params x 3 dims, unires/_update.py:633-658) and contracts them
against the gradient/Hessian volumes with 27 full-volume reductions. Because
dAff_i,d(o) is AFFINE in the voxel coordinate o, every contraction
    sum_o W(o) * dAff_i,d1(o) * dAff_j,d2(o)
is a quadratic form in the order-<=2 spatial MOMENTS of W. So the device
computes only the moments (m0, m1, m2 — 10 scalars per weight volume, fused
by XLA into the same pass as the matching term) and the 6x6 system is
assembled on host in float64. No dAff volumes ever touch HBM.

Moments use centred coordinates for conditioning; the shift is absorbed in
the host-side assembly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import dexpm, expm
from ..models.proj_op import ProjOp, proj_info
from ..ops.conv import blur_down_sep, blur_up_sep
from ..ops.resample import pull, pull_grad
from ..ops.scaling import apply_scaling

Array = jax.Array

# symmetric 3x3 -> 6-vector index map (reference _update.py:564)
_LKP = [[0, 3, 4], [3, 1, 5], [4, 5, 2]]


def _moments(W: Array, coords):
    """(m0, m1[3], m2[6]) of W over centred voxel coordinates."""
    ii, jj, kk = coords
    m0 = jnp.sum(W)
    m1 = jnp.stack([jnp.sum(W * ii), jnp.sum(W * jj), jnp.sum(W * kk)])
    m2 = jnp.stack([
        jnp.sum(W * ii * ii), jnp.sum(W * jj * jj), jnp.sum(W * kk * kk),
        jnp.sum(W * ii * jj), jnp.sum(W * ii * kk), jnp.sum(W * jj * kk),
    ])
    return m0, m1, m2


def _centred_coords(dim, center):
    X, Y, Z = dim
    ii = (jax.lax.broadcasted_iota(jnp.float32, (X, 1, 1), 0) - center[0])
    jj = (jax.lax.broadcasted_iota(jnp.float32, (1, Y, 1), 1) - center[1])
    kk = (jax.lax.broadcasted_iota(jnp.float32, (1, 1, Z), 2) - center[2])
    return ii, jj, kk


def make_rigid_fns(po: ProjOp, method: str):
    """Jitted (match_stats, match_ll) for one (possibly subsampled) operator.

    match_stats(dat_x, dat_y, M, scl, tau) ->
        (ll, G_m0 (3,), G_m1 (3,3), W_m0 (6,), W_m1 (6,3), W_m2 (6,6moms))
    where G_d = (pull_grad_d * CtC-filtered residual) and W_k the 6 Hessian
    weight volumes (grad outer products, CtC-modulated for super-resolution).
    """
    sr = method == "super-resolution"
    dim = po.dim_yx if sr else po.dim_x
    kers = po.smo_ker_1d
    ratio = po.ratio
    axis = po.dim_thick
    center = tuple((d - 1) / 2.0 for d in dim)

    if sr:
        ones = jnp.ones(dim, jnp.float32)
        CtC_const = blur_up_sep(blur_down_sep(ones, kers, ratio), kers, ratio)

    @jax.jit
    def match_ll(dat_x, dat_y, M, scl, tau):
        dat_yx = pull(dat_y, M, dim)
        if sr:
            dat_yx = blur_down_sep(dat_yx, kers, ratio)
            dat_yx = apply_scaling(dat_yx, scl, axis)
        msk = dat_x != 0
        res = jnp.where(msk, dat_x - dat_yx, 0.0)
        return 0.5 * tau * jnp.sum(res * res)

    @jax.jit
    def match_stats(dat_x, dat_y, M, scl, tau):
        dat_yx_raw = pull(dat_y, M, dim)
        if sr:
            dat_yx = blur_down_sep(dat_yx_raw, kers, ratio)
            dat_yx = apply_scaling(dat_yx, scl, axis)
        else:
            dat_yx = dat_yx_raw
        gr = pull_grad(dat_y, M, dim)  # (dim..., 3), on the pre-blur grid
        msk_x = dat_x != 0
        res = jnp.where(msk_x, dat_x - dat_yx, 0.0)
        ll = 0.5 * tau * jnp.sum(res * res)

        # residual term for the gradient (reference :519-536)
        diff = dat_yx - dat_x
        mm = msk_x & (dat_yx != 0)
        diff = jnp.where(mm, diff, 0.0)
        if sr:
            diff = blur_up_sep(diff, kers, ratio)  # back to the yx grid
            ctc = CtC_const
        else:
            ctc = jnp.float32(1.0)

        coords = _centred_coords(dim, center)
        g_m0 = []
        g_m1 = []
        for d in range(3):
            Gd = gr[..., d] * diff
            m0, m1, _ = _moments(Gd, coords)
            g_m0.append(m0)
            g_m1.append(m1)
        w_m0 = []
        w_m1 = []
        w_m2 = []
        pairs = [(0, 0), (1, 1), (2, 2), (0, 1), (0, 2), (1, 2)]
        for (d1, d2) in pairs:
            Wk = gr[..., d1] * gr[..., d2] * ctc
            m0, m1, m2 = _moments(Wk, coords)
            w_m0.append(m0)
            w_m1.append(m1)
            w_m2.append(m2)
        return (ll, jnp.stack(g_m0), jnp.stack(g_m1),
                jnp.stack(w_m0), jnp.stack(w_m1), jnp.stack(w_m2))

    return match_stats, match_ll, center


def _assemble(g_m0, g_m1, w_m0, w_m1, w_m2, dRq, center):
    """Host f64 assembly of the 6-dim GN gradient/Hessian from moments.

    dAff_{i,d}(o) = c[i,d] + sum_e b[i,d,e] * (o_e - center_e) with
    b[i,d,e] = dRq[i][d,e], c[i,d] = dRq[i][d,3] + sum_e b*center_e.
    """
    K = len(dRq)
    b = np.zeros((K, 3, 3))
    cc = np.zeros((K, 3))
    for i in range(K):
        b[i] = dRq[i][:3, :3]
        cc[i] = dRq[i][:3, 3] + dRq[i][:3, :3] @ np.asarray(center)
    g = np.zeros(K)
    for i in range(K):
        for d in range(3):
            g[i] += cc[i, d] * g_m0[d] + b[i, d] @ g_m1[d]
    # symmetric second-moment matrix per weight volume
    def m2mat(m2):
        return np.array([
            [m2[0], m2[3], m2[4]],
            [m2[3], m2[1], m2[5]],
            [m2[4], m2[5], m2[2]],
        ])

    H = np.zeros((K, K))
    for d1 in range(3):
        for d2 in range(3):
            k = _LKP[d1][d2]
            m0 = w_m0[k]
            m1 = w_m1[k]
            M2 = m2mat(w_m2[k])
            for i in range(K):
                bi, ci = b[i, d1], cc[i, d1]
                for j in range(i, K):
                    bj, cj = b[j, d2], cc[j, d2]
                    H[i, j] += (ci * cj * m0 + ci * (bj @ m1) + cj * (bi @ m1)
                                + bi @ M2 @ bj)
    for i in range(K):
        for j in range(i + 1, K):
            H[j, i] = H[i, j]
    return g, H


def update_rigid(x, y, sett, mean_correct: bool = True, max_niter_gn: int = 1,
                 num_linesearch: int = 4, samp: int = 3, fns_cache: dict | None = None):
    """Gauss-Newton update of every observation's rigid_q (reference :198-267)."""
    basis = sett.rigid_basis
    sll = 0.0
    for c in range(len(x)):
        for n, o in enumerate(x[c]):
            sll += _update_rigid_obs(o, y[c], sett, basis, max_niter_gn,
                                     num_linesearch, samp, fns_cache, key=(c, n))

    if mean_correct:
        from ..geometry import fov_centre, rigid_from_q

        qs = [o.rigid_q for ch in x for o in ch]
        mean_q = np.mean(qs, axis=0)
        centre = fov_centre(y[0].mat, y[0].dim)
        for ch in x:
            for o in ch:
                o.rigid_q = o.rigid_q - mean_q
                o.po.rigid = rigid_from_q(o.rigid_q, basis, centre)
    return x, sll


def _update_rigid_obs(o, yc, sett, basis, max_niter_gn, num_linesearch, samp,
                      fns_cache, key):
    method = sett.method
    # subsampled operator for speed (reference :576-579)
    po = proj_info(o.po.dim_y, o.po.mat_y, o.dim, o.mat,
                   rigid=o.po.rigid, prof_ip=sett.profile_ip,
                   prof_tp=sett.profile_tp, gap=sett.gap, scl=o.po.scl, samp=samp)
    mat = po.mat_yx if method == "super-resolution" else po.mat_x

    cache_key = (key, samp, po.dim_x, po.dim_yx)
    if fns_cache is not None and cache_key in fns_cache:
        match_stats, match_ll, center, dat_x = fns_cache[cache_key]
    else:
        match_stats, match_ll, center = make_rigid_fns(po, method)
        if samp > 0 and po.D_x is not None:
            # NN-subsample the observation once (reference :589-593)
            Ms = jnp.asarray(po.D_x[:3, :4].astype(np.float32))
            dat_x = pull(o.dat, Ms, po.dim_x, order=0)
        else:
            dat_x = o.dat
        if fns_cache is not None:
            fns_cache[cache_key] = (match_stats, match_ll, center, dat_x)

    q = np.asarray(o.rigid_q, np.float64).copy()
    tau = jnp.float32(o.tau)
    scl = jnp.float32(po.scl)
    # centre-conjugated pose parameterization (geometry.rigid_from_q);
    # MUST match solvers.fitloop's pre/post folding
    from ..geometry import affine_translation, fov_centre

    centre = fov_centre(po.mat_y, po.dim_y)
    pre_c = np.linalg.solve(np.asarray(po.mat_y, np.float64),
                            affine_translation(centre))
    post_c = affine_translation(-centre) @ np.asarray(mat, np.float64)
    armijo = 1.0
    ll = None
    for _ in range(max_niter_gn):
        R, dR = dexpm(q, basis)
        K = basis.shape[0]
        dRq = [pre_c @ dR[i] @ post_c for i in range(K)]
        M = jnp.asarray((pre_c @ R @ post_c)[:3, :4].astype(np.float32))
        out = match_stats(dat_x, yc.dat, M, scl, tau)
        ll = float(out[0])
        g_m0, g_m1, w_m0, w_m1, w_m2 = [np.asarray(v, np.float64) for v in out[1:]]
        g, H = _assemble(g_m0, g_m1, w_m0, w_m1, w_m2, dRq, center)
        try:
            update = np.linalg.solve(H, g)
        except np.linalg.LinAlgError:
            break
        old_ll, old_q = ll, q.copy()
        if num_linesearch == 0:
            q = old_q - armijo * update
        else:
            for _ls in range(num_linesearch):
                cand = old_q - armijo * update
                Rc = expm(cand, basis)
                Mc = jnp.asarray((pre_c @ Rc @ post_c)[:3, :4]
                                 .astype(np.float32))
                cand_ll = float(match_ll(dat_x, yc.dat, Mc, scl, tau))
                if cand_ll < old_ll:
                    q, ll = cand, cand_ll
                    armijo = min(1.25 * armijo, 1.0)
                    break
                armijo *= 0.5
            else:
                q, ll = old_q, old_ll
    o.rigid_q = q
    o.po.rigid = (affine_translation(centre) @ expm(q, basis)
                  @ affine_translation(-centre))
    return float(ll) if ll is not None else 0.0
