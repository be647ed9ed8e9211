"""Matrix-free conjugate gradients with max-gain stopping.

Re-implements nitorch.core.optim.cg semantics as pinned by its call-site in
the reference y-update (unires/_update.py:140-148: inplace CG on (sum tau
AtA + rho lam^2 DtD), 20 iterations, stop='max_gain', tol 1e-3), as a
``jax.lax.while_loop`` so the whole ADMM step stays on device under one jit.

Gain definition (nitorch get_gain): gain_k = (f_{k-1} - f_k) / (max f - min f)
over the objective trace f_k = 1/2 y^T A y - b^T y, tracked incrementally via
running max/min (no history buffer needed on device).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

Array = jax.Array


def cg(A: Callable[[Array], Array], b: Array, x0: Array, max_iter: int = 20,
       tol: float = 1e-3, precond: Callable[[Array], Array] | None = None,
       stop: str = "max_gain") -> Array:
    """Solve A x = b for SPD matrix-free A, starting at x0. jit-safe.

    stop='max_gain' mirrors the reference (objective gain normalised by the
    trace's own range — note this rarely fires on warm starts, so it
    effectively runs max_iter, like the reference). stop='residual' exits
    when the preconditioned residual energy <r, P r> drops below tol^2 of
    <b, P b> — an absolute criterion, so warm starts that are already
    converged exit after one iteration (the max_gain form cannot).
    """
    if precond is None:
        precond = lambda v: v

    def dot(a, c):
        return jnp.sum(a * c)

    r0 = b - A(x0)
    z0 = precond(r0)
    p0 = z0
    rz0 = dot(r0, z0)
    if stop == "residual":
        ref = dot(b, precond(b))
    else:
        ref = rz0
    # objective f = 1/2 x^T A x - b^T x = -1/2 (<x,b> + <x,r>)
    f0 = -0.5 * (dot(x0, b) + dot(x0, r0))

    def body(carry):
        x, r, p, rz, f_prev, f_max, f_min, it, done = carry
        Ap = A(p)
        pAp = dot(p, Ap)
        alpha = rz / jnp.maximum(pAp, jnp.float32(1e-30))
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = dot(r, z)
        beta = rz_new / jnp.maximum(rz, jnp.float32(1e-30))
        p = z + beta * p
        if stop == "residual":
            done = rz_new < (tol * tol) * jnp.maximum(ref, jnp.float32(1e-30))
            f = f_prev
        else:
            f = -0.5 * (dot(x, b) + dot(x, r))
            f_max = jnp.maximum(f_max, f)
            f_min = jnp.minimum(f_min, f)
            denom = jnp.maximum(f_max - f_min, jnp.float32(1e-30))
            gain = (f_prev - f) / denom
            done = (it >= 1) & (jnp.abs(gain) < tol)
        return x, r, p, rz_new, f, f_max, f_min, it + 1, done

    def cond(carry):
        *_, it, done = carry
        return (it < max_iter) & jnp.logical_not(done)

    init = (x0, r0, p0, rz0, f0, f0, f0, jnp.int32(0), jnp.bool_(False))
    out = jax.lax.while_loop(cond, body, init)
    return out[0]


def cg_batched(A: Callable[[Array], Array], b: Array, x0: Array,
               max_iter: int = 20, tol: float = 1e-3,
               precond: Callable[[Array], Array] | None = None,
               verbose: bool = False, return_iters: bool = False):
    """Residual-stop PCG over a leading batch (channel) axis, one while_loop.

    Each batch entry follows exactly the trajectory ``cg(..., stop=
    'residual')`` would give it alone — per-entry alpha/beta from inner
    products over the volume axes, entries that reach their stopping
    residual are FROZEN (alpha = 0, p/rz held) while the rest iterate — but
    the operator and the preconditioner are applied to the whole stack.
    The compiled program then contains ONE preconditioner instance instead
    of C: the spectral preconditioner compiles to tens of MB of TPU code
    per instance (see solvers.admm.dct_matrices), and batching the channel
    axis into its matmuls also runs ~2.4x faster than C separate calls
    (measured v5e, C=3 at 181x217x181).
    """
    if precond is None:
        precond = lambda v: v
    axes = tuple(range(1, b.ndim))

    def dot(a, c):
        return jnp.sum(a * c, axis=axes)

    def bc(s):
        return s.reshape(s.shape + (1,) * (b.ndim - 1))

    r0 = b - A(x0)
    z0 = precond(r0)
    p0 = z0
    rz0 = dot(r0, z0)
    ref = (tol * tol) * jnp.maximum(dot(b, precond(b)), jnp.float32(1e-30))

    def body(carry):
        x, r, p, rz, live, it = carry
        Ap = A(p)
        pAp = dot(p, Ap)
        alpha = jnp.where(live, rz / jnp.maximum(pAp, jnp.float32(1e-30)),
                          0.0)
        x = x + bc(alpha) * p
        r = r - bc(alpha) * Ap
        z = precond(r)
        rz_new = jnp.where(live, dot(r, z), rz)
        beta = rz_new / jnp.maximum(rz, jnp.float32(1e-30))
        p = jnp.where(bc(live), z + bc(beta) * p, p)
        live = live & (rz_new >= ref)
        if verbose:  # Settings.cgs_verbose (reference cg verbose prints)
            jax.debug.print("cg it={it} rz={rz}", it=it, rz=rz_new)
        return x, r, p, rz_new, live, it + 1

    def cond(carry):
        *_, live, it = carry
        return jnp.any(live) & (it < max_iter)

    live0 = jnp.ones(b.shape[0], bool)  # cg always runs >= 1 iteration
    out = jax.lax.while_loop(cond, body, (x0, r0, p0, rz0, live0,
                                          jnp.int32(0)))
    if return_iters:
        return out[0], out[5]
    return out[0]
