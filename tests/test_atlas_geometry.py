"""Atlas geometry validation that RUNS in CI (round-4 VERDICT item 5).

``scripts/validate_atlas.py`` validates against a REAL MNI template but
unconditionally SKIPs without ``UNIRES_ATLAS`` (zero-egress environments).
These tests make the atlas/crop path executable everywhere: the structured
brain phantom (tests/phantoms.brain_phantom) lives at known MNI coordinates
(``return_mat=True`` — same frame as unires_tpu.data.default_atlas and
geometry._BB_MM), so a known synthetic "scanner" transform applied to its
header must be recovered by ``atlas_align`` and undone by the full
``common_output``/``crop`` init path.

Reference semantics: unires/_core.py:70-71 (_bb_atlas crop boxes),
:233-234 (crop applied to the mean space), :345 (atlas_align).
"""
import numpy as np
import pytest

from phantoms import brain_phantom
from unires_tpu import Settings, init
from unires_tpu.geometry import (affine_matrix_classic, bb_atlas,
                                 affine_diag, voxel_size)
from unires_tpu.pipeline.registration import atlas_align

import jax.numpy as jnp


def _phantom_2mm():
    """T1 brain phantom at 2 mm (1 mm generation, stride-2), MNI header."""
    vol, mat = brain_phantom(dim=(181, 217, 181), contrast="t1",
                             amplitude=2000.0, seed=0, return_mat=True)
    vol2 = vol[::2, ::2, ::2].copy()
    mat2 = mat @ affine_diag([2.0, 2.0, 2.0])
    return vol2, mat2


# the synthetic "scanner" pose: what a subject's head position in the
# scanner does to the header relative to MNI
_T_SYNTH = affine_matrix_classic([8.0, -5.0, 4.0, 0.04, -0.03, 0.02])


def test_atlas_align_recovers_synthetic_scanner_transform():
    vol, mat = _phantom_2mm()
    mat_pert = _T_SYNTH @ mat
    mat_a = atlas_align((jnp.asarray(vol), mat_pert), rigid=True)
    # init applies solve(mat_a, mat_pert): the corrected header must match
    # the true MNI placement as a world TRANSFORM (compare action on the
    # head FOV, not matrix entries)
    corr = np.linalg.solve(mat_a, mat_pert)
    err = corr @ np.linalg.inv(mat)  # residual world transform
    t_mm = np.linalg.norm(err[:3, 3])
    ang = float(np.arccos(np.clip((np.trace(err[:3, :3]) - 1) / 2, -1, 1)))
    # displacement over the brain FOV: |t| + |rot| * ~90mm radius
    assert t_mm + 90.0 * ang < 6.0, (t_mm, ang)


def test_common_output_grid_geometry_end_to_end():
    """--common_output: atlas-align + crop puts every subject on the SAME
    atlas-box grid, with the anatomy at its true MNI coordinates."""
    vol, mat = _phantom_2mm()
    mat_pert = _T_SYNTH @ mat

    # max_iter=0: init-only (reslice output path, reference max_iter=0)
    sett = Settings(vx=2.0, do_coreg=False, do_print=0, write_out=False,
                    common_output=True, max_iter=0)
    x, y, sett = init([[vol, mat_pert]], sett)

    # 1. output grid == the atlas 'brain' box at the recon voxel size
    #    (format_y crop branch, reference _core.py:230-239), then padded by
    #    ceil_pow to "nice" dims (common_output forces pow=256, centred —
    #    reference _core.py:240-253)
    from unires_tpu.geometry import ceil_pow

    mat_mu, dim_mm = bb_atlas(fov="brain")
    vx_y = voxel_size(y[0].mat)
    want_mat = mat_mu @ affine_diag(vx_y)
    want_dim = np.floor(dim_mm / vx_y)
    ndim = np.minimum(ceil_pow(want_dim, p=2.0, l=2.0, mx=256),
                      ceil_pow(want_dim, p=2.0, l=3.0, mx=256))
    want_mat = want_mat @ affine_matrix_classic(
        -np.round((ndim - want_dim) / 2.0))
    assert np.allclose(np.asarray(y[0].mat), want_mat, atol=1e-6), \
        (np.asarray(y[0].mat), want_mat)
    assert tuple(int(d) for d in y[0].dim) == tuple(int(d) for d in ndim)
    # the padded grid must still CONTAIN the atlas brain box
    mn_mm, mx_mm = want_mat[:3, 3], (want_mat @ np.r_[ndim - 1, 1.0])[:3]
    bmn, bmx = mat_mu[:3, 3], mat_mu[:3, 3] + dim_mm - 1.0
    assert (mn_mm <= bmn + 1e-6).all() and (mx_mm >= bmx - vx_y - 1e-6).all()

    # 2. the anatomy LANDS at its true MNI coordinates on that grid:
    #    intensity-weighted world centroid of the resliced output vs the
    #    phantom's (atlas-align must have undone _T_SYNTH)
    rec = np.asarray(y[0].dat)
    Ay = np.asarray(y[0].mat)

    def centroid(dat, A):
        w = np.maximum(dat, 0.0).astype(np.float64)
        s = w.sum()
        idx = [(w.sum(axis=tuple(a for a in range(3) if a != d))
                * np.arange(dat.shape[d])).sum() / s for d in range(3)]
        return (A @ np.array(idx + [1.0]))[:3]

    c_rec = centroid(rec, Ay)
    c_true = centroid(vol, mat)
    assert np.linalg.norm(c_rec - c_true) < 4.0, (c_rec, c_true)
