"""The forward model: A, A^T and A^T A for super-resolution / denoising.

Re-design of the reference ``_proj_apply`` chain (unires/_project.py:99-190):

  super-resolution:
    A   y = S_scl . C_blur,stride=ratio . Pull_{M}  y           (:161-167)
    A^T x = Push_{M} . C^T               . S_scl    x           (:168-172)
    A^T A = Push . C^T . S_{2 scl} . C . Pull                   (:173-179)
  denoising:
    A = Pull, A^T = Push, A^T A = Push . Pull                   (:180-188)

with M = mat_y \\ rigid @ mat_yx (or mat_x for denoising). All shapes are
static per operator; the dynamic inputs are the data volume, the (3,4) map M
(changes when the rigid transform updates) and the scaling scalar. Functions
are pure and jit-safe; call them inside a jitted solver step so XLA fuses the
elementwise scaling into the convs.
"""
from __future__ import annotations

import os
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.conv import blur_down_sep, blur_up_sep
from ..ops.pallas_resample import (dyn_l1, dyn_span, dyn_span_shear,
                                   pallas_pull, pallas_pull_grad,
                                   pallas_pull_grad_shear, pallas_pull_shear,
                                   pallas_push, pallas_push_shear,
                                   plan_capacity_pull,
                                   plan_capacity_pull_shear,
                                   plan_capacity_push,
                                   plan_capacity_push_shear, plan_pull,
                                   plan_pull_shear, plan_push,
                                   plan_push_shear)
from ..ops.resample import pull, pull_grad, push, push_window
from ..ops.scaling import apply_scaling
from .proj_op import ProjOp

Method = Literal["super-resolution", "denoising"]


def _use_pallas() -> bool:
    env = os.environ.get("UNIRES_TPU_BACKEND", "auto")
    if env == "pallas":
        return True
    if env == "xla":
        return False
    return jax.default_backend() == "tpu"


def make_resample_ops(po: ProjOp, method: Method, rigid=None):
    """(pull_fn, push_fn) for one observation's geometry.

    Dispatch: Pallas shift-and-select kernels on TPU whenever the nominal
    affine admits a bounded window plan (always for this pipeline's operators:
    pull/push act between ~same-resolution grids); XLA gather fallback
    otherwise (CPU tests, tiny volumes, extreme affines).

    pull_fn(dat, M) and push_fn(dat, M, Minv) take the DYNAMIC (3,4) maps so
    rigid-pose updates never retrace. ``rigid`` overrides the plan-time pose
    (defaults to po.rigid) so the fit loop can re-plan from a drifted pose.
    """
    suite = make_resample_suite(po, method, rigid)
    return suite["pull"], suite["push"]


def make_resample_suite(po: ProjOp, method: Method, rigid=None,
                        extra_budget: float = 0.0,
                        pose_budget: float = 0.05) -> dict:
    """Resampling ops + validity guard for one observation's geometry.

    Returns a dict with:
      pull(dat, M), push(dat, M, Minv), pull_grad(dat, M)  — dynamic-map ops
      capacity_ok(M, Minv) -> bool scalar (device)          — True iff the
          dynamic maps are within the static window plans (Pallas) or the
          static push window (XLA fallback). The fit loop rejects rigid
          candidates for which this is False and re-plans at chunk
          boundaries, closing the round-1 silent-drift hole (ADVICE.md high).
      margin(M, Minv) -> (3,) f32 device                    — min per-axis
          span headroom remaining (used by the host re-plan policy).
    """
    src_dim = po.dim_yx if method == "super-resolution" else po.dim_x
    dim_y = po.dim_y
    M_nom = po.M_sr(rigid) if method == "super-resolution" else po.M_den(rigid)

    use_shear = os.environ.get("UNIRES_TPU_SHEAR", "1") not in ("0", "")
    eb = float(extra_budget)  # radians; the fit loop escalates on saturation
    # pose_budget: base per-plan drift allowance (radians). The fit loop
    # passes Settings.pose_budget (default 0.02 — plans re-centre at every
    # re-plan and per-chunk drift is millirad at steady state, so the old
    # blanket 0.05 bought nothing but wider windows: ~2x inner-loop volume
    # on pull AND push at bench geometry). Standalone callers keep 0.05.
    rb = float(pose_budget) + eb
    pplan = fplan = splan = psplan = None
    if _use_pallas():
        if use_shear:
            splan = plan_pull_shear(dim_y, src_dim, M_nom, rot_budget=rb)
            psplan = plan_push_shear(src_dim, dim_y, M_nom, rot_budget=rb,
                                     l1_slack=0.2 + 2.0 * eb)
        # the plain plans are only built when shear is off/unplannable: the
        # shear plan drives pull, pull_grad AND (via psplan) push, so the
        # pose budget is the DMA cover (~+-0.05 rad) everywhere (the round-2
        # plain-plan pull_grad pinned it to ~+-0.03 rad — VERDICT item 7).
        # UNIRES_TPU_SHEAR_GRAD=0: keep shear pull/push but fall back to the
        # plain-plan pull_grad (the exact round-2 kernel mix; bisect knob
        # for the round-3 full-scale worker crash).
        if splan is None or os.environ.get(
                "UNIRES_TPU_SHEAR_GRAD", "1") in ("0", ""):
            fplan = plan_pull(dim_y, src_dim, M_nom,
                              abs_slack=4.0 + 136.0 * eb)
        if psplan is None:
            pplan = plan_push(src_dim, dim_y, M_nom,
                              abs_slack=4.0 + 136.0 * eb,
                              l1_slack=0.2 + 2.0 * eb)

    checks = []  # callables M, Minv -> (3,) headroom (span units)

    if splan is not None:
        # shear pre-pass pull: windows are rotation-independent; only the
        # DMA cover bounds the pose budget (~+-0.05 rad)
        def pull_fn(dat, M):
            return pallas_pull_shear(dat, M, src_dim, splan)

        s_tile, s_wcap, s_ccap = plan_capacity_pull_shear(splan)
        s_wcapj = jnp.asarray(s_wcap, jnp.float32)
        s_ccapj = jnp.asarray(s_ccap, jnp.float32)

        def _pull_headroom(M, Minv, tile=s_tile, wcap=s_wcapj, ccap=s_ccapj):
            hw = wcap - dyn_span_shear(M, tile)
            hc = ccap - dyn_span(M, tile)[:2]
            return jnp.minimum(hw, jnp.concatenate(
                [hc, jnp.full((1,), jnp.float32(_BIG_HEAD))]))

        checks.append(_pull_headroom)
    elif fplan is not None:
        def pull_fn(dat, M):
            return pallas_pull(dat, M, src_dim, fplan)

        f_tile, f_cap = plan_capacity_pull(fplan)
        f_capj = jnp.asarray(f_cap, jnp.float32)

        def _pull_headroom(M, Minv, tile=f_tile, cap=f_capj):
            return cap - dyn_span(M, tile)

        checks.append(_pull_headroom)
    else:
        def pull_fn(dat, M):
            return pull(dat, M, src_dim)
        # XLA gather pull: valid for any affine

    if psplan is not None:
        def push_fn(dat, M, Minv):
            return pallas_push_shear(dat, M, Minv, dim_y, psplan)

        ps_tile, ps_wcap, ps_l1, ps_ccap = plan_capacity_push_shear(psplan)
        ps_wcapj = jnp.asarray(ps_wcap, jnp.float32)
        ps_l1j = jnp.asarray(ps_l1, jnp.float32)
        ps_ccapj = jnp.asarray(ps_ccap, jnp.float32)

        def _push_headroom(M, Minv, tile=ps_tile, wcap=ps_wcapj,
                           l1cap=ps_l1j, ccap=ps_ccapj):
            hw = wcap - dyn_span_shear(Minv, tile)
            hl = l1cap - 1e-4 - dyn_l1(Minv)
            hc = ccap - dyn_span(Minv, tile)[:2]
            hc3 = jnp.concatenate(
                [hc, jnp.full((1,), jnp.float32(_BIG_HEAD))])
            return jnp.minimum(jnp.minimum(hw, hl), hc3)

        checks.append(_push_headroom)
    elif pplan is not None:
        def push_fn(dat, M, Minv):
            return pallas_push(dat, M, Minv, dim_y, pplan)

        p_tile, p_cap, p_l1cap = plan_capacity_push(pplan)
        p_capj = jnp.asarray(p_cap, jnp.float32)
        p_l1j = jnp.asarray(p_l1cap, jnp.float32)

        def _push_headroom(M, Minv, tile=p_tile, cap=p_capj, l1cap=p_l1j):
            span_head = cap - dyn_span(Minv, tile)
            l1_head = l1cap - 1e-4 - dyn_l1(Minv)
            return jnp.minimum(span_head, l1_head)

        checks.append(_push_headroom)
    else:
        window = push_window(M_nom, extra=2.0 * eb)

        def push_fn(dat, M, Minv):
            return push(dat, M, dim_y, Minv=Minv, window=window)

        winj = jnp.asarray(window, jnp.float32)

        def _push_headroom(M, Minv, win=winj):
            # window covers candidates within win of round(c): need L1<=win+0.5
            return win + 0.5 - dyn_l1(Minv)

        checks.append(_push_headroom)

    if splan is not None and fplan is None:
        def pull_grad_fn(dat, M):
            return pallas_pull_grad_shear(dat, M, src_dim, splan)
    elif fplan is not None:
        # plain-plan pull_grad (also the UNIRES_TPU_SHEAR_GRAD=0 path when a
        # shear plan exists); its narrower windows must join the capacity veto
        def pull_grad_fn(dat, M):
            return pallas_pull_grad(dat, M, src_dim, fplan)

        if splan is not None:
            g_tile, g_cap = plan_capacity_pull(fplan)
            g_capj = jnp.asarray(g_cap, jnp.float32)

            def _grad_headroom(M, Minv, tile=g_tile, cap=g_capj):
                return cap - dyn_span(M, tile)

            checks.append(_grad_headroom)
    else:
        def pull_grad_fn(dat, M):
            return pull_grad(dat, M, src_dim)

    def margin(M, Minv):
        hs = [chk(M, Minv) for chk in checks]
        return jnp.min(jnp.stack(hs), axis=0) if hs else \
            jnp.full((3,), jnp.float32(_BIG_HEAD))

    def capacity_ok(M, Minv):
        return jnp.all(margin(M, Minv) >= 0.0)

    return dict(pull=pull_fn, push=push_fn, pull_grad=pull_grad_fn,
                capacity_ok=capacity_ok, margin=margin,
                # static plan tuples: everything pose-dependent that lands in
                # the traced program (window/cover/tile sizes) — the honest
                # cache-key surrogate for the nominal pose (utils.aot)
                plans=(splan, psplan, fplan, pplan),
                pallas=(fplan is not None or splan is not None,
                        pplan is not None or psplan is not None))


_BIG_HEAD = 1e6  # "unlimited" headroom sentinel (span units)


def make_obs_suite(po: ProjOp, method: Method, rigid=None,
                   extra_budget: float = 0.0,
                   pose_budget: float = 0.05) -> dict:
    """Everything the solvers need for one observation, as a dict.

    Extends :func:`make_resample_suite` with the full projection chains
    (A/At/AtA, reference unires/_project.py:99-190) and ``project`` — the
    scaling-free forward chain pull+blur used by the even/odd scaling GN
    update (reference unires/_update.py:312-318).
    """
    rs = make_resample_suite(po, method, rigid, extra_budget=extra_budget,
                             pose_budget=pose_budget)
    pull_fn, push_fn = rs["pull"], rs["push"]
    if method == "denoising":
        def A(dat, M, Minv, scl):
            return pull_fn(dat, M)

        def At(dat, M, Minv, scl):
            return push_fn(dat, M, Minv)

        def AtA(dat, M, Minv, scl):
            return push_fn(pull_fn(dat, M), M, Minv)

        def project(dat, M):
            return pull_fn(dat, M)

        rs.update(A=A, At=At, AtA=AtA, project=project)
        return rs

    kers = po.smo_ker_1d
    ratio = po.ratio
    axis = po.dim_thick

    def A(dat, M, Minv, scl):
        out = pull_fn(dat, M)
        out = blur_down_sep(out, kers, ratio)
        return apply_scaling(out, scl, axis)

    def At(dat, M, Minv, scl):
        out = apply_scaling(dat, scl, axis)
        out = blur_up_sep(out, kers, ratio)
        return push_fn(out, M, Minv)

    def AtA(dat, M, Minv, scl):
        out = pull_fn(dat, M)
        out = blur_down_sep(out, kers, ratio)
        out = apply_scaling(out, 2.0 * scl, axis)
        out = blur_up_sep(out, kers, ratio)
        return push_fn(out, M, Minv)

    def project(dat, M):
        return blur_down_sep(pull_fn(dat, M), kers, ratio)

    rs.update(A=A, At=At, AtA=AtA, project=project)
    return rs


def make_obs_ops(po: ProjOp, method: Method, rigid=None):
    """A / At / AtA callables for one observation (dynamic M/Minv/scl args).

    The full chains of the reference _proj_apply (unires/_project.py:99-190):
    resampling via :func:`make_resample_ops`, slice-profile blur/decimation on
    XLA convs, diagonal even/odd scaling fused by XLA.
    """
    pull_fn, push_fn = make_resample_ops(po, method, rigid)
    if method == "denoising":
        def A(dat, M, Minv, scl):
            return pull_fn(dat, M)

        def At(dat, M, Minv, scl):
            return push_fn(dat, M, Minv)

        def AtA(dat, M, Minv, scl):
            return push_fn(pull_fn(dat, M), M, Minv)

        return A, At, AtA

    kers = po.smo_ker_1d
    ratio = po.ratio
    axis = po.dim_thick

    def A(dat, M, Minv, scl):
        out = pull_fn(dat, M)
        out = blur_down_sep(out, kers, ratio)
        return apply_scaling(out, scl, axis)

    def At(dat, M, Minv, scl):
        out = apply_scaling(dat, scl, axis)
        out = blur_up_sep(out, kers, ratio)
        return push_fn(out, M, Minv)

    def AtA(dat, M, Minv, scl):
        out = pull_fn(dat, M)
        out = blur_down_sep(out, kers, ratio)
        out = apply_scaling(out, 2.0 * scl, axis)
        out = blur_up_sep(out, kers, ratio)
        return push_fn(out, M, Minv)

    return A, At, AtA


def obs_dyn_args(po: ProjOp, method: Method, rigid=None):
    """(M, Minv) device operands for the observation's current rigid pose."""
    M = po.M_sr(rigid) if method == "super-resolution" else po.M_den(rigid)
    M4 = np.eye(4)
    M4[:3, :4] = M
    Minv = np.linalg.inv(M4)[:3, :4].astype(np.float32)
    return jnp.asarray(M), jnp.asarray(Minv)


def proj_apply(operator: str, dat, po: ProjOp, method: Method, M=None, scl=None):
    """Apply 'A' | 'At' | 'AtA' | 'none' of one observation's operator.

    Args:
        operator: which map to apply.
        dat: (dim_y) for A/AtA, (dim_x) for At.
        po: static geometry.
        M: (3,4) f32 device map (defaults to po's rigid); pass explicitly when
           the rigid transform is a traced value.
        scl: even/odd scaling scalar (defaults to po.scl).

    Returns the projected volume ((dim_x) for A, (dim_y) for At/AtA).
    """
    if operator == "none":
        return dat
    if operator not in ("A", "At", "AtA"):
        raise ValueError(f"Undefined operator {operator!r}")
    if method not in ("super-resolution", "denoising"):
        raise ValueError(f"Undefined method {method!r}")

    scl = jnp.float32(po.scl if scl is None else scl)
    if M is None:
        M, Minv = obs_dyn_args(po, method)
    else:
        M4 = np.eye(4)
        M4[:3, :4] = np.asarray(M, np.float64)
        Minv = jnp.asarray(np.linalg.inv(M4)[:3, :4].astype(np.float32))
    ops = make_obs_ops(po, method)
    fn = {"A": ops[0], "At": ops[1], "AtA": ops[2]}[operator]
    return fn(dat, M, Minv, scl)


def check_adjoint(po: ProjOp, method: Method, seed: int = 0):
    """<Ay, x> - <A^T x, y> on seeded random volumes (reference
    unires/_project.py:27-51). Returns the (should-be-tiny) difference."""
    import numpy as np

    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.random(po.dim_x, dtype=np.float32))
    y = jnp.asarray(rng.random(po.dim_y, dtype=np.float32))
    Ay = proj_apply("A", y, po, method)
    Atx = proj_apply("At", x, po, method)
    # elementwise-multiply + sum stays in f32 on TPU (vdot would hit bf16 MXU)
    lhs = jnp.sum(Ay * x)
    rhs = jnp.sum(Atx * y)
    return float(lhs - rhs), float(lhs)
