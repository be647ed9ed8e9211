"""Slice-profile blur + integer decimation (and exact adjoint).

Replaces torch F.conv3d / F.conv_transpose3d with stride=ratio (reference
unires/_project.py:153-157, unires/_update.py:316/503/534/608-610) with
``jax.lax.conv_general_dilated``. XLA maps these onto the MXU and fuses the
surrounding elementwise work.

Semantics (pinned by the reference):
  * ``blur_down``: VALID cross-correlation with the (non-separable) kernel at
    integer stride ``ratio``. With dim_in = (dim_out-1)*ratio + ker, the output
    has exactly dim_out voxels (the proj_info padding guarantees this,
    reference unires/_project.py:279-285).
  * ``blur_up``: the EXACT adjoint (conv_transpose): zero-stuff by ``ratio``
    then full correlation with the flipped kernel.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_DN3 = ("NCXYZ", "OIXYZ", "NCXYZ")
_DN2 = ("NCXY", "OIXY", "NCXY")


# ---------------------------------------------------------------------------
# Polyphase separable path (default): the slice-profile kernel is an outer
# product of short per-axis 1D kernels, so the strided blur is K strided
# slices + weighted adds per axis — pure elementwise VPU work that XLA fuses
# into neighbouring ops. lax.conv on TPU measured 18-59 ms per application at
# 181^3 (plus a ~130 ms layout penalty when composed with Pallas kernels);
# this path is ~100x cheaper.
# ---------------------------------------------------------------------------

def _down_1d(dat: Array, k: np.ndarray, r: int, axis: int) -> Array:
    """out[i] = sum_t k[t] * dat[r*i + t] (VALID strided correlation)."""
    K = k.shape[0]
    if K == 1 and r == 1:
        return dat * float(k[0])
    n = dat.shape[axis]
    n_out = (n - K) // r + 1
    out = None
    for t in range(K):
        sl = [slice(None)] * dat.ndim
        sl[axis] = slice(t, t + (n_out - 1) * r + 1, r)
        term = float(k[t]) * dat[tuple(sl)]
        out = term if out is None else out + term
    return out


def _up_1d(dat: Array, k: np.ndarray, r: int, axis: int) -> Array:
    """Exact adjoint of :func:`_down_1d`: out[r*i + t] += k[t] * dat[i]."""
    K = k.shape[0]
    if K == 1 and r == 1:
        return dat * float(k[0])
    n = dat.shape[axis]
    n_out = (n - 1) * r + K
    # dilate by r along axis: interleave with zeros via stack+reshape
    if r > 1:
        parts = [dat] + [jnp.zeros_like(dat)] * (r - 1)
        dil = jnp.stack(parts, axis=axis + 1)
        shape = list(dat.shape)
        shape[axis] = n * r
        dil = dil.reshape(shape)
        sl = [slice(None)] * dat.ndim
        sl[axis] = slice(0, (n - 1) * r + 1)
        dil = dil[tuple(sl)]
    else:
        dil = dat
    # full correlation with the kernel: out[j] = sum_t k[t] * dil[j - t]
    pad = [(0, 0)] * dat.ndim
    pad[axis] = (K - 1, K - 1)
    dp = jnp.pad(dil, pad)
    out = None
    for t in range(K):
        sl = [slice(None)] * dat.ndim
        sl[axis] = slice(K - 1 - t, K - 1 - t + n_out)
        term = float(k[t]) * dp[tuple(sl)]
        out = term if out is None else out + term
    return out


def blur_down_sep(dat: Array, kers_1d, ratio) -> Array:
    """Separable strided blur: per-axis polyphase passes."""
    for axis, (k, r) in enumerate(zip(kers_1d, ratio)):
        dat = _down_1d(dat, np.asarray(k), int(r), axis)
    return dat


def blur_up_sep(dat: Array, kers_1d, ratio) -> Array:
    """Exact adjoint of :func:`blur_down_sep`."""
    for axis, (k, r) in enumerate(zip(kers_1d, ratio)):
        dat = _up_1d(dat, np.asarray(k), int(r), axis)
    return dat


@partial(jax.jit, static_argnames=("ratio",))
def blur_down(dat: Array, ker: Array, ratio) -> Array:
    """VALID strided correlation of a bare (X,Y,Z) volume with (kx,ky,kz)."""
    nd = dat.ndim
    dn = _DN3 if nd == 3 else _DN2
    out = jax.lax.conv_general_dilated(
        dat[None, None],
        ker[None, None],
        window_strides=tuple(int(r) for r in ratio),
        padding="VALID",
        dimension_numbers=dn,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # keep f32 (MXU defaults to bf16)
    )
    return out[0, 0]


@partial(jax.jit, static_argnames=("ratio",))
def blur_up(dat: Array, ker: Array, ratio) -> Array:
    """Exact adjoint of :func:`blur_down` (conv_transpose with same kernel)."""
    nd = dat.ndim
    dn = _DN3 if nd == 3 else _DN2
    ratio = tuple(int(r) for r in ratio)
    kdims = ker.shape
    # adjoint of VALID stride-s correlation: dilate input by s, pad by k-1,
    # correlate with the spatially flipped kernel. The dilation+padding is
    # done explicitly with lax.pad (interior padding): conv lhs_dilation is
    # miscompiled on the TPU backend we target (verified wrong vs CPU).
    flip = ker[tuple(slice(None, None, -1) for _ in range(nd))]
    cfg = [(k - 1, k - 1, r - 1) for k, r in zip(kdims, ratio)]
    dil = jax.lax.pad(dat, jnp.float32(0), cfg)
    out = jax.lax.conv_general_dilated(
        dil[None, None],
        flip[None, None],
        window_strides=(1,) * nd,
        padding="VALID",
        dimension_numbers=dn,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # keep f32 (MXU defaults to bf16)
    )
    return out[0, 0]
