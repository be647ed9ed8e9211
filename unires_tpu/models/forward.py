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

from typing import Literal

import jax.numpy as jnp

from ..ops.conv import blur_down, blur_up
from ..ops.resample import pull, push
from ..ops.scaling import apply_scaling
from .proj_op import ProjOp

Method = Literal["super-resolution", "denoising"]


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

    scl = po.scl if scl is None else scl
    has_scl = not (isinstance(scl, float) and scl == 0.0)

    if method == "denoising":
        M = jnp.asarray(po.M_den(), jnp.float32) if M is None else M
        if operator == "A":
            return pull(dat, M, po.dim_x)
        if operator == "At":
            return push(dat, M, po.dim_y)
        return push(pull(dat, M, po.dim_x), M, po.dim_y)

    # super-resolution
    M = jnp.asarray(po.M_sr(), jnp.float32) if M is None else M
    ker = jnp.asarray(po.smo_ker)
    if operator == "A":
        out = pull(dat, M, po.dim_yx)
        out = blur_down(out, ker, po.ratio)
        if has_scl:
            out = apply_scaling(out, scl, po.dim_thick)
        return out
    if operator == "At":
        out = dat
        if has_scl:
            out = apply_scaling(out, scl, po.dim_thick)
        out = blur_up(out, ker, po.ratio)
        return push(out, M, po.dim_y)
    # AtA
    out = pull(dat, M, po.dim_yx)
    out = blur_down(out, ker, po.ratio)
    if has_scl:
        out = apply_scaling(out, 2.0 * scl, po.dim_thick)
    out = blur_up(out, ker, po.ratio)
    return push(out, M, po.dim_y)


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
