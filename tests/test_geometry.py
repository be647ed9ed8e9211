import numpy as np
import pytest
from scipy.linalg import expm as scipy_expm

from unires_tpu import geometry as geo


def test_voxel_size():
    mat = geo.affine_diag([1.0, 2.0, 4.0])
    assert np.allclose(geo.voxel_size(mat), [1, 2, 4])
    # rotation does not change voxel size
    R = geo.affine_matrix_classic([0, 0, 0, 0.3, -0.2, 0.1])
    assert np.allclose(geo.voxel_size(R @ mat), [1, 2, 4])


def test_affine_basis_se3():
    B = geo.affine_basis("SE")
    assert B.shape == (6, 4, 4)
    # translations
    assert B[0, 0, 3] == 1.0
    # rotations are antisymmetric in the 3x3 block
    for k in range(3, 6):
        A = B[k, :3, :3]
        assert np.allclose(A, -A.T)


def test_expm_matches_scipy():
    B = geo.affine_basis("SE")
    q = np.array([1.0, -2.0, 0.5, 0.1, -0.05, 0.2])
    X = np.einsum("k,kij->ij", q, B)
    assert np.allclose(geo.expm(q, B), scipy_expm(X))


def test_dexpm_matches_finite_difference():
    B = geo.affine_basis("SE")
    q = np.array([0.5, 1.0, -0.3, 0.05, 0.02, -0.04])
    R, dR = geo.dexpm(q, B)
    eps = 1e-6
    for k in range(6):
        qp = q.copy()
        qp[k] += eps
        qm = q.copy()
        qm[k] -= eps
        fd = (geo.expm(qp, B) - geo.expm(qm, B)) / (2 * eps)
        assert np.allclose(dR[k], fd, atol=1e-6), k


def test_mean_space_identity():
    mat = np.eye(4)
    mats = np.stack([mat, mat, mat])
    dims = np.array([[64, 64, 64]] * 3, dtype=float)
    m, d, vx = geo.mean_space(mats, dims, vx=[1.0, 1.0, 1.0])
    assert np.allclose(vx, 1.0)
    assert tuple(d) == (64, 64, 64)
    # grid must cover the inputs: corner 0 and corner dim-1 map inside
    inv = np.linalg.inv(m)
    c0 = (inv @ mat @ np.array([0, 0, 0, 1.0]))[:3]
    c1 = (inv @ mat @ np.array([63, 63, 63, 1.0]))[:3]
    assert (c0 >= -0.5).all() and (c1 <= np.asarray(d) - 0.5).all()


def test_mean_space_mixed_vx():
    m1 = geo.affine_diag([1, 1, 4])
    m2 = geo.affine_matrix_classic([3.0, -2.0, 1.0]) @ geo.affine_diag([1, 4, 1])
    mats = np.stack([m1, m2])
    dims = np.array([[181, 217, 46], [181, 55, 181]], dtype=float)
    m, d, vx = geo.mean_space(mats, dims, vx=[1.0, 1.0, 1.0])
    assert np.allclose(geo.voxel_size(m), 1.0, atol=1e-6)
    assert (np.asarray(d) >= 181).all()


def test_ceil_pow():
    out = geo.ceil_pow(np.array([181, 217, 100]), p=2.0, l=2.0, mx=256)
    assert (out == [256, 256, 128]).all()


def test_bb_atlas():
    mat, dim = geo.bb_atlas("brain")
    assert dim.shape == (3,)
    mat2, dim2 = geo.bb_atlas("head")
    assert (dim2 >= dim).all()
    with pytest.raises(ValueError):
        geo.bb_atlas("nope")


def test_bb_atlas_boxes_contain_procedural_anatomy():
    """Cross-check the hardcoded _BB_MM crop boxes against the bundled
    atlas's anatomy (round-3 VERDICT item 7, environment-local half: the
    real-template check lives in scripts/validate_atlas.py and runs when
    UNIRES_ATLAS provides an MNI T1): the 'brain' box must contain the
    template's bright voxels, the 'head' box its above-background voxels."""
    import numpy as np

    from unires_tpu.data.atlas import default_atlas
    from unires_tpu.geometry import bb_atlas

    dat, mat = default_atlas()
    ii, jj, kk = np.meshgrid(*(np.arange(d) for d in dat.shape),
                             indexing="ij")
    Xw = mat[0, 0] * ii + mat[0, 3]
    Yw = mat[1, 1] * jj + mat[1, 3]
    Zw = mat[2, 2] * kk + mat[2, 3]
    for fov, q in (("brain", 60.0), ("head", 10.0)):
        bmat, bdim = bb_atlas(fov)
        mn = bmat[:3, 3]
        mx = mn + np.asarray(bdim) - 1.0
        thr = np.percentile(dat[dat > 0], q)
        sel = dat > thr
        inside = ((Xw >= mn[0]) & (Xw <= mx[0]) & (Yw >= mn[1])
                  & (Yw <= mx[1]) & (Zw >= mn[2]) & (Zw <= mx[2]))
        frac = float(np.mean(inside[sel]))
        assert frac >= 0.98, (fov, frac)


def test_rigid_log_roundtrip():
    from unires_tpu.geometry import affine_basis, expm, rigid_log

    B = affine_basis("SE")
    q = np.array([3.0, -2.0, 1.5, 0.05, -0.03, 0.08])
    R = expm(q, B)
    assert np.allclose(rigid_log(R, B), q, atol=1e-10)
    # and from a classic-parameterised matrix (different factorization)
    from unires_tpu.geometry import affine_matrix_classic

    M = affine_matrix_classic([1.0, 2.0, -0.5, 0.04, 0.02, -0.06])
    assert np.allclose(expm(rigid_log(M, B), B), M, atol=1e-10)
