"""Synthetic 3D phantoms + degradation helpers for integration tests.

Replaces the BrainWeb volumes of the reference demos (absent git-LFS blobs,
see BASELINE.md): smooth blob phantoms degraded with the SAME forward
operator the solver uses (reference demo_single_channel.ipynb cell 4).
"""
import numpy as np

from unires_tpu.geometry import affine_diag, affine_matrix_classic
from unires_tpu.models.forward import proj_apply
from unires_tpu.models.proj_op import proj_info

import jax.numpy as jnp


def blob_phantom(dim=(48, 48, 48), n_blobs=6, amplitude=1000.0, seed=0):
    rng = np.random.default_rng(seed)
    d = np.asarray(dim)
    ii, jj, kk = np.meshgrid(*[np.arange(n) for n in dim], indexing="ij")
    vol = np.zeros(dim, np.float32)
    for _ in range(n_blobs):
        c = rng.uniform(0.2, 0.8, 3) * d
        r = rng.uniform(0.1, 0.25) * d.mean()
        vol += np.exp(-(((ii - c[0]) ** 2 + (jj - c[1]) ** 2 + (kk - c[2]) ** 2)
                        / r ** 2)).astype(np.float32)
    vol *= amplitude / max(vol.max(), 1e-6)
    return vol


def degrade(gt, thick_axis=2, thick=4.0, rigid_params=None, noise_sd=25.0,
            scl=0.0, seed=0, prof_ip=2, prof_tp=0, gap=0.0):
    """Simulate x = A y + noise for a thick-slice acquisition.

    Returns (x_np, mat_x, po) with mat_x the observation affine.
    """
    rng = np.random.default_rng(seed + 100)
    dim_y = gt.shape
    mat_y = np.eye(4)
    vx = [1.0, 1.0, 1.0]
    vx[thick_axis] = thick
    mat_x = affine_diag(vx)
    if rigid_params is not None:
        rigid = affine_matrix_classic(rigid_params)
    else:
        rigid = np.eye(4)
    dim_x = list(dim_y)
    dim_x[thick_axis] = int(np.ceil(dim_y[thick_axis] / thick))
    po = proj_info(dim_y, mat_y, tuple(dim_x), mat_x, rigid=rigid,
                   prof_ip=prof_ip, prof_tp=prof_tp, gap=gap, scl=scl)
    x = np.asarray(proj_apply("A", jnp.asarray(gt), po, "super-resolution"))
    # like the reference demos: additive noise, NOT clipped (hyper-parameter
    # estimation masks negatives itself, reference _core.py:119-121)
    x = x + noise_sd * rng.standard_normal(x.shape).astype(np.float32)
    # the world-space affine of the observation includes the rigid motion:
    # the solver should recover rigid as part of its operator
    return x.astype(np.float32), mat_x, po
