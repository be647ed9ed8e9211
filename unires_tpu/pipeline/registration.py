"""Rigid inter-image registration by normalised mutual information.

Replaces nitorch.tools.preproc.affine_align / atlas_align / reset_origin as
used by the reference init (unires/_core.py:310-368, coreg_params at
struct.py:69: NMI cost, SE group, fwhm 7, fixed image).

TPU-first design (not a port): the joint histogram uses SOFT (linear)
binning, making NMI differentiable end-to-end — gradients w.r.t. the se(3)
parameters flow through the trilinear pull and jax.scipy.linalg.expm via
autodiff, so the optimiser is L-BFGS on an exact gradient instead of the
reference's derivative-free search. The histogram is accumulated with chunked
(64, chunk) one-hot matmuls on the MXU (no scatter — TPUs have none worth
using). A multi-resolution pyramid (8/4/2 mm) gives robustness and speed.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import affine_basis, voxel_size
from ..ops.resample import affine_to_M, pull

Array = jax.Array


# ---------------------------------------------------------------------------
# Pyramid helpers
# ---------------------------------------------------------------------------

def _gauss_kernel1d(sd: float) -> np.ndarray:
    if sd < 1e-3:
        return np.ones(1, np.float32)
    r = max(1, int(np.ceil(3 * sd)))
    t = np.arange(-r, r + 1)
    k = np.exp(-0.5 * (t / sd) ** 2)
    return (k / k.sum()).astype(np.float32)


@jax.jit
def _smooth_sep(vol, kx, ky, kz):
    """Separable gaussian smoothing (same-size, zero bound)."""
    def conv1(v, k, axis):
        n = k.shape[0]
        pad = [(0, 0)] * 3
        pad[axis] = (n // 2, n // 2)
        vp = jnp.pad(v, pad)
        dn = ("NCXYZ", "OIXYZ", "NCXYZ")
        shape = [1, 1, 1]
        shape[axis] = n
        return jax.lax.conv_general_dilated(
            vp[None, None], k.reshape([1, 1] + shape), (1, 1, 1), "VALID",
            dimension_numbers=dn, precision=jax.lax.Precision.HIGHEST)[0, 0]

    vol = conv1(vol, kx, 0)
    vol = conv1(vol, ky, 1)
    vol = conv1(vol, kz, 2)
    return vol


def _pyramid_level(dat, mat, target_mm: float, fwhm_mm: float):
    """Smooth + decimate to ~target_mm grid; returns (dat, mat)."""
    vx = voxel_size(mat)
    # smooth: combined kernel reaching fwhm_mm plus anti-alias for decimation
    sds = []
    for d in range(3):
        fw = max(fwhm_mm, 0.0)
        aa = max(target_mm / vx[d], 1.0)  # decimation factor
        sd_vox = np.sqrt((fw / 2.355) ** 2 + (0.42 * (aa ** 2 - 1))) / vx[d] \
            if aa > 1 else fw / 2.355 / vx[d]
        sds.append(float(sd_vox))
    ks = [jnp.asarray(_gauss_kernel1d(sd)) for sd in sds]
    sm = _smooth_sep(dat, *ks)
    step = np.maximum(np.floor(target_mm / vx + 0.5), 1.0)
    if (step > 1).any():
        sl = tuple(slice(None, None, int(s)) for s in step)
        sm = sm[sl]
        D = np.diag(list(step) + [1.0])
        mat = mat @ D
    return sm, np.asarray(mat, np.float64)


# ---------------------------------------------------------------------------
# Differentiable NMI
# ---------------------------------------------------------------------------

def _soft_hist_weights(t, bins):
    """(chunk,) normalised intensities -> (bins, chunk) linear bin weights."""
    centers = jnp.arange(bins, dtype=jnp.float32)[:, None]
    return jnp.maximum(0.0, 1.0 - jnp.abs(t[None, :] - centers))


def se3_expm(q, basis):
    """Closed-form differentiable SE(3) exponential (Rodrigues + V matrix).

    jax.scipy.linalg.expm is differentiable but compiles a huge graph
    (squaring chains); for the registration loop's 4x4 this closed form
    keeps the per-level jit compile seconds instead of minutes.
    """
    X = jnp.einsum("k,kij->ij", q.astype(jnp.float32), basis)
    O = X[:3, :3]  # antisymmetric (SE basis)
    w = jnp.stack([O[2, 1], O[0, 2], O[1, 0]])
    th2 = jnp.sum(w * w)
    big = th2 > 1e-8
    # the where-gradient trap: the unselected branch must still have finite
    # gradients, so feed it a SAFE theta (1.0) instead of ~0
    th2s = jnp.where(big, th2, 1.0)
    th = jnp.sqrt(th2s)
    a = jnp.where(big, jnp.sin(th) / th, 1.0 - th2 / 6.0)
    b = jnp.where(big, (1.0 - jnp.cos(th)) / th2s, 0.5 - th2 / 24.0)
    c = jnp.where(big, (th - jnp.sin(th)) / (th2s * th), 1.0 / 6.0 - th2 / 120.0)
    O2 = O @ O
    R3 = jnp.eye(3) + a * O + b * O2
    V = jnp.eye(3) + b * O + c * O2
    t = V @ X[:3, 3]
    top = jnp.concatenate([R3, t[:, None]], axis=1)
    return jnp.concatenate([top, jnp.asarray([[0.0, 0.0, 0.0, 1.0]])], axis=0)


def make_nmi_loss(fix_dat, fix_mat, mov_dat, mov_mat, bins: int = 64,
                  chunk: int = 1 << 16):
    """Jitted (loss, grad) of -NMI w.r.t. q (se(3) params, (6,))."""
    basis = jnp.asarray(affine_basis("SE"), jnp.float32)
    # fixed-side quantities are constant: precompute normalised intensities
    f = fix_dat.ravel()
    fmin, fmax = jnp.min(f), jnp.max(f)
    fn = (f - fmin) / jnp.maximum(fmax - fmin, 1e-12) * (bins - 1)
    mmin, mmax = jnp.min(mov_dat), jnp.max(mov_dat)

    # host geometry: M(q) = inv(mov_mat) @ R(q) @ fix_mat  (fixed vox -> mov vox)
    pre = jnp.asarray(np.linalg.inv(mov_mat).astype(np.float32))
    post = jnp.asarray(np.asarray(fix_mat, np.float64).astype(np.float32))
    fix_dim = fix_dat.shape
    V = int(np.prod(fix_dim))
    nchunk = -(-V // chunk)
    Vp = nchunk * chunk
    pad = Vp - V

    fn_p = jnp.pad(fn, (0, pad), constant_values=-10.0)  # pad -> zero weight

    def loss_fn(q):
        R = se3_expm(q, basis)
        M = (pre @ R @ post)[:3, :4]
        mov = pull(mov_dat, M, fix_dim).ravel()
        mn = (mov - mmin) / jnp.maximum(mmax - mmin, 1e-12) * (bins - 1)
        mn_p = jnp.pad(mn, (0, pad), constant_values=-10.0)

        def body(carry, idx):
            joint = carry
            sl = jax.lax.dynamic_slice(fn_p, (idx * chunk,), (chunk,))
            sm = jax.lax.dynamic_slice(mn_p, (idx * chunk,), (chunk,))
            Wf = _soft_hist_weights(sl, bins)
            Wm = _soft_hist_weights(sm, bins)
            joint = joint + jnp.dot(Wf, Wm.T, precision=jax.lax.Precision.HIGHEST)
            return joint, None

        joint, _ = jax.lax.scan(body, jnp.zeros((bins, bins), jnp.float32),
                                jnp.arange(nchunk))
        joint = joint / jnp.maximum(jnp.sum(joint), 1e-12)
        pf = jnp.sum(joint, axis=1)
        pm = jnp.sum(joint, axis=0)
        eps = 1e-12
        hf = -jnp.sum(pf * jnp.log(pf + eps))
        hm = -jnp.sum(pm * jnp.log(pm + eps))
        hj = -jnp.sum(joint * jnp.log(joint + eps))
        return -(hf + hm) / jnp.maximum(hj, eps)

    return jax.jit(jax.value_and_grad(loss_fn))


# translations are in mm, rotations in radians: scale the search directions
_QSCALE = np.array([1.0, 1.0, 1.0, 0.01, 0.01, 0.01], np.float32)


def make_nmi_opt(fix_dat, fix_mat, mov_dat, mov_mat, bins: int = 64,
                 iters: int = 150):
    """Jitted device-side NMI minimiser over se(3).

    One device call runs the whole level: adaptive-step preconditioned
    gradient descent (accept -> step*1.5, reject -> step*0.4) as a
    lax.while_loop. Replaces a host L-BFGS whose per-eval host<->device
    round-trips dominated init (~70 s/pair measured over the device tunnel).
    """
    vg = make_nmi_loss(fix_dat, fix_mat, mov_dat, mov_mat, bins=bins)
    # (make_nmi_loss returns a jitted value_and_grad; compose un-jitted here)
    scale = jnp.asarray(_QSCALE)

    def opt(q0):
        l0, g0 = vg(q0)

        def body(carry):
            q, loss, g, step, it = carry
            cand = q - step * scale * scale * g  # diag preconditioner
            new_loss, new_g = vg(cand)
            accept = new_loss < loss
            q = jnp.where(accept, cand, q)
            loss = jnp.where(accept, new_loss, loss)
            g = jnp.where(accept, new_g, g)
            step = jnp.where(accept, step * 1.4, step * 0.5)
            return q, loss, g, step, it + 1

        def cond(carry):
            *_, step, it = carry
            return (it < iters) & (step > 1e-7)

        out = jax.lax.while_loop(
            cond, body, (q0, l0, g0, jnp.float32(100.0), jnp.int32(0)))
        return out[0], out[1]

    return jax.jit(opt)


def _register_pair(fix_dat, fix_mat, mov_dat, mov_mat, q0, levels, fwhm,
                   bins=64, maxiter=150):
    """Multi-resolution device-side NMI registration; returns optimal q."""
    q = jnp.asarray(np.asarray(q0, np.float32))
    for lev_mm in levels:
        fd, fm = _pyramid_level(fix_dat, fix_mat, lev_mm, fwhm)
        md, mm = _pyramid_level(mov_dat, mov_mat, lev_mm, fwhm)
        opt = make_nmi_opt(fd, fm, md, mm, bins=bins, iters=maxiter)
        q, _ = opt(q)
    return np.asarray(q, np.float64)


def affine_align(imgs: Sequence[Tuple[Array, np.ndarray]], fix: int = 0,
                 cost_fun: str = "nmi", group: str = "SE", samp=1,
                 fwhm: float = 7.0, mean_space: bool = False,
                 levels: Sequence[float] = (8.0, 4.0)) -> np.ndarray:
    """Pairwise rigid alignment of all images to imgs[fix].

    Returns mat_a (N,4,4): world-space transforms; applying
    ``mat <- solve(mat_a[i], mat)`` aligns the images (the reference applies
    exactly this at unires/_core.py:336).
    """
    if cost_fun != "nmi":
        raise NotImplementedError(f"cost_fun={cost_fun!r} (only 'nmi')")
    if group != "SE":
        raise NotImplementedError(f"group={group!r} (only 'SE')")
    N = len(imgs)
    basis = affine_basis("SE")
    mat_a = np.stack([np.eye(4)] * N)
    fix_dat, fix_mat = imgs[fix]
    fix_dat = jnp.asarray(fix_dat, jnp.float32)
    # include the finest level only if samp asks for it
    levels = tuple(l for l in levels if l >= samp) or (float(samp),)
    for i in range(N):
        if i == fix:
            continue
        mov_dat, mov_mat = imgs[i]
        q = _register_pair(fix_dat, fix_mat, jnp.asarray(mov_dat, jnp.float32),
                           mov_mat, np.zeros(6), levels, fwhm)
        from ..geometry import expm

        mat_a[i] = expm(q, basis)
    return mat_a


# ---------------------------------------------------------------------------
# Atlas alignment / origin reset
# ---------------------------------------------------------------------------

_ATLAS_PATH_ENV = "UNIRES_ATLAS"


def atlas_align(img: Tuple[Array, np.ndarray], rigid: bool = True,
                atlas_path: Optional[str] = None) -> np.ndarray:
    """Align one image to a T1 atlas (reference _core.py:340-353).

    The nitorch atlas volume is not redistributable here; an atlas can be
    supplied via ``atlas_path`` or the UNIRES_ATLAS env var (any NIfTI in
    MNI-like space). Without one, a geometric fallback is used: translate the
    image's FOV centre onto the atlas-box centre (orientation untouched),
    which keeps --common_output / --crop functional on typical data.
    """
    import os

    dat, mat = img
    atlas_path = atlas_path or os.environ.get(_ATLAS_PATH_ENV)
    if atlas_path:
        from .nifti import load as nifti_load

        adat, ahdr = nifti_load(atlas_path)
        q = _register_pair(jnp.asarray(adat, jnp.float32), ahdr.affine,
                           jnp.asarray(dat, jnp.float32), mat,
                           np.zeros(6), levels=(8.0, 4.0), fwhm=7.0)
        from ..geometry import expm

        return expm(q, affine_basis("SE"))
    # fallback: centre the FOV on the atlas box centre
    import warnings

    warnings.warn("atlas_align: no atlas volume available (set UNIRES_ATLAS); "
                  "using FOV-centring fallback", stacklevel=2)
    dim = np.asarray(dat.shape, np.float64)
    centre_world = (np.asarray(mat) @ np.concatenate([(dim - 1) / 2, [1.0]]))[:3]
    mat_a = np.eye(4)
    mat_a[:3, 3] = centre_world  # atlas centre is the origin (AC)
    return mat_a


def reset_origin(dat: Array, mat: np.ndarray):
    """Reset the volume origin to its FOV centre (reference: nitorch
    reset_origin for CT, unires/_core.py:145-168). Affine-only (no resample)."""
    dim = np.asarray(dat.shape, np.float64)
    new_mat = np.asarray(mat, np.float64).copy()
    new_mat[:3, 3] = -(new_mat[:3, :3] @ ((dim - 1) / 2.0))
    return dat, new_mat
