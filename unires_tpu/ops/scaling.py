"""Even/odd slice scaling for interleaved acquisitions.

Reference: unires/_project.py:9-24 (_apply_scaling) and
unires/_update.py:430-445 (_even_odd). Slices at even index along the thick
axis scale by exp(+s), odd by exp(-s). The operator is diagonal, hence
self-adjoint; A and A^T apply the same scaling (unires/_project.py:164-172).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array


@partial(jax.jit, static_argnames=("axis",))
def apply_scaling(dat: Array, scl: Array, axis: int) -> Array:
    """Multiply even-index slices along ``axis`` by exp(scl), odd by exp(-scl)."""
    n = dat.shape[axis]
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    sgn = jnp.where(idx % 2 == 0, 1.0, -1.0).astype(dat.dtype)
    shape = [1] * dat.ndim
    shape[axis] = n
    return dat * jnp.exp(scl * sgn.reshape(shape))


def even_slices(dat: Array, axis: int) -> Array:
    """Slices at even indices (the exp(+s) group)."""
    sl = [slice(None)] * dat.ndim
    sl[axis] = slice(0, None, 2)
    return dat[tuple(sl)]


def odd_slices(dat: Array, axis: int) -> Array:
    """Slices at odd indices (the exp(-s) group)."""
    sl = [slice(None)] * dat.ndim
    sl[axis] = slice(1, None, 2)
    return dat[tuple(sl)]
