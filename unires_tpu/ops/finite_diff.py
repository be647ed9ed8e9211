"""Finite-difference gradient / divergence (D and D^T) for the JTV prior.

Re-implements nitorch.spatial.im_gradient / im_divergence semantics pinned by
the reference call-sites (unires/_project.py:314-315, unires/_update.py:132,
168-193, 419): difference type 'forward'|'backward'|'central', voxel-size
scaled, Dirichlet-zero bound, with ``im_divergence`` being the EXACT adjoint
of ``im_gradient`` (the solver adds rho*lam^2 * D^T D to the CG normal matrix,
unires/_project.py:87, so adjointness is load-bearing).

Layout: gradient of a (X, Y, Z) image is (3, X, Y, Z) — same as the reference
(z/w buffers are (C, 3, *dim_y), unires/_update.py:17-32).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array


def _slice_to(ndim, axis, start, size):
    sl = [slice(None)] * ndim
    sl[axis] = slice(start, start + size)
    return tuple(sl)


def _roll_zero(u, shift, axis):
    """Shift with zero fill (Dirichlet bound)."""
    n = u.shape[axis]
    if shift == 1:  # u[i-1]
        pad = [(0, 0)] * u.ndim
        pad[axis] = (1, 0)
        return jnp.pad(u, pad)[_slice_to(u.ndim, axis, 0, n)]
    elif shift == -1:  # u[i+1]
        pad = [(0, 0)] * u.ndim
        pad[axis] = (0, 1)
        return jnp.pad(u, pad)[_slice_to(u.ndim, axis, 1, n)]
    raise ValueError(shift)


@partial(jax.jit, static_argnames=("which",))
def im_gradient(dat: Array, vx, which: str = "forward") -> Array:
    """D dat: (3, X, Y, Z), per-axis finite difference divided by voxel size."""
    vx = jnp.asarray(vx, dtype=dat.dtype)
    gs = []
    for d in range(3):
        if which == "forward":
            g = _roll_zero(dat, -1, d) - dat
        elif which == "backward":
            g = dat - _roll_zero(dat, 1, d)
        elif which == "central":
            g = 0.5 * (_roll_zero(dat, -1, d) - _roll_zero(dat, 1, d))
        else:
            raise ValueError(which)
        gs.append(g / vx[d])
    return jnp.stack(gs, axis=0)


@partial(jax.jit, static_argnames=("which",))
def im_divergence(p: Array, vx, which: str = "forward") -> Array:
    """D^T p: exact adjoint of :func:`im_gradient` (NOT the negative adjoint)."""
    vx = jnp.asarray(vx, dtype=p.dtype)
    out = jnp.zeros(p.shape[1:], dtype=p.dtype)
    for d in range(3):
        q = p[d]
        if which == "forward":
            # adjoint of u -> (u[i+1]-u[i]): p -> p[i-1]-p[i]
            a = _roll_zero(q, 1, d) - q
        elif which == "backward":
            # adjoint of u -> (u[i]-u[i-1]): p -> p[i]-p[i+1]
            a = q - _roll_zero(q, -1, d)
        elif which == "central":
            a = 0.5 * (_roll_zero(q, 1, d) - _roll_zero(q, -1, d))
        else:
            raise ValueError(which)
        out = out + a / vx[d]
    return out


def DtD(dat: Array, vx, which: str = "forward") -> Array:
    """D^T (D dat) — the membrane/TV-quadratic operator added to the CG lhs
    (reference unires/_project.py:300-317)."""
    return im_divergence(im_gradient(dat, vx, which), vx, which)
