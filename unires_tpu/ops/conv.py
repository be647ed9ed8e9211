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

Array = jax.Array

_DN3 = ("NCXYZ", "OIXYZ", "NCXYZ")
_DN2 = ("NCXY", "OIXY", "NCXY")


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
