import jax.numpy as jnp
import numpy as np
import pytest
from scipy import ndimage

from unires_tpu.geometry import affine_matrix_classic, affine_diag
from unires_tpu.ops.resample import (
    affine_to_M,
    pull,
    push,
    pull_grad,
    separable_matrices,
    _apply_separable,
)


def _rand_vol(shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.random(shape, dtype=np.float32)


def _ref_pull(vol, mat, out_dim, order=1):
    """scipy map_coordinates oracle with our extrapolate=False mask."""
    out_dim = tuple(out_dim)
    ii, jj, kk = np.meshgrid(*[np.arange(d, dtype=np.float64) for d in out_dim], indexing="ij")
    g = np.stack(
        [mat[d, 0] * ii + mat[d, 1] * jj + mat[d, 2] * kk + mat[d, 3] for d in range(3)]
    )
    # 'grid-constant' = zero-padded partial interpolation (our 'zero' bound)
    out = ndimage.map_coordinates(vol.astype(np.float64), g, order=order, mode="grid-constant", cval=0.0)
    mask = np.ones(out_dim, bool)
    for d in range(3):
        mask &= (g[d] >= -0.5) & (g[d] <= vol.shape[d] - 0.5)
    return (out * mask).astype(np.float32)


AFFINES = [
    np.eye(4),
    affine_matrix_classic([2.5, -1.0, 0.75]),
    affine_matrix_classic([1.0, 0.0, -2.0, 0.05, -0.1, 0.07]),
    affine_matrix_classic([0.0, 0.0, 0.0, 0.0, 0.0, 0.0]) @ affine_diag([0.9, 1.1, 2.0]),
    affine_matrix_classic([4.0, 2.0, -3.0, 0.2, 0.1, -0.15]) @ affine_diag([1.3, 0.8, 1.0]),
]


@pytest.mark.parametrize("mat", AFFINES)
def test_pull_matches_scipy_trilinear(mat):
    vol = _rand_vol((17, 19, 23))
    out_dim = (15, 18, 21)
    got = np.asarray(pull(jnp.asarray(vol), affine_to_M(mat), out_dim, order=1))
    want = _ref_pull(vol, mat, out_dim, order=1)
    assert np.allclose(got, want, atol=2e-5), np.abs(got - want).max()


@pytest.mark.parametrize("mat", AFFINES)
def test_pull_nearest(mat):
    vol = _rand_vol((17, 19, 23), seed=3)
    out_dim = (15, 18, 21)
    got = np.asarray(pull(jnp.asarray(vol), affine_to_M(mat), out_dim, order=0))
    want = _ref_pull(vol, mat, out_dim, order=0)
    # f32 coordinate rounding may flip ties; allow a few mismatched voxels
    frac_diff = np.mean(~np.isclose(got, want, atol=1e-6))
    assert frac_diff < 5e-3


@pytest.mark.parametrize("mat", AFFINES)
@pytest.mark.parametrize("order", [0, 1])
def test_push_is_exact_adjoint(mat, order):
    in_dim, out_dim = (17, 19, 23), (15, 18, 21)
    vol = _rand_vol(in_dim, seed=1)
    vals = _rand_vol(out_dim, seed=2)
    M = affine_to_M(mat)
    Ay = np.asarray(pull(jnp.asarray(vol), M, out_dim, order=order), np.float64)
    Atx = np.asarray(push(jnp.asarray(vals), M, in_dim, order=order), np.float64)
    lhs = np.sum(Ay * vals)
    rhs = np.sum(Atx * vol)
    assert abs(lhs - rhs) < 1e-3 * max(1.0, abs(lhs))


def test_pull_grad_matches_finite_difference():
    mat = affine_matrix_classic([1.0, -0.5, 0.25, 0.03, -0.06, 0.02])
    vol = _rand_vol((16, 17, 18), seed=4)
    # smooth the volume so trilinear FD is meaningful
    vol = ndimage.gaussian_filter(vol, 2.0).astype(np.float32)
    out_dim = (14, 15, 16)
    M = affine_to_M(mat)
    g = np.asarray(pull_grad(jnp.asarray(vol), M, out_dim))
    eps = 1e-3
    for d in range(3):
        Mp = np.array(M)
        Mp[d, 3] += eps
        Mm = np.array(M)
        Mm[d, 3] -= eps
        fp = np.asarray(pull(jnp.asarray(vol), jnp.asarray(Mp), out_dim))
        fm = np.asarray(pull(jnp.asarray(vol), jnp.asarray(Mm), out_dim))
        fd = (fp - fm) / (2 * eps)
        # interior only (edges hit the FOV mask / kinks of trilinear)
        sl = (slice(2, -2),) * 3
        assert np.allclose(g[..., d][sl], fd[sl], atol=5e-3), d


def test_separable_fast_path_matches_gather():
    # permuted, scaled, translated affine: exactly separable
    P = np.zeros((4, 4))
    P[0, 1], P[1, 2], P[2, 0], P[3, 3] = 1.0, 1.0, 1.0, 1.0
    mat = P @ affine_diag([2.0, 0.5, 1.25])
    mat[:3, 3] = [1.5, -2.0, 3.0]
    in_dim, out_dim = (17, 19, 23), (16, 20, 18)
    vol = _rand_vol(in_dim, seed=7)
    M = affine_to_M(mat)
    want = np.asarray(pull(jnp.asarray(vol), M, out_dim, order=1))
    Ws, perm = separable_matrices(mat, in_dim, out_dim, order=1)
    got = np.asarray(_apply_separable(jnp.asarray(vol), Ws, perm))
    assert np.allclose(got, want, atol=2e-5)


def test_separable_transpose_is_adjoint():
    P = np.zeros((4, 4))
    P[0, 1], P[1, 2], P[2, 0], P[3, 3] = 1.0, 1.0, 1.0, 1.0
    mat = P @ affine_diag([2.0, 0.5, 1.25])
    mat[:3, 3] = [1.5, -2.0, 3.0]
    in_dim, out_dim = (17, 19, 23), (16, 20, 18)
    vol = _rand_vol(in_dim, seed=8)
    vals = _rand_vol(out_dim, seed=9)
    Ws, perm = separable_matrices(mat, in_dim, out_dim, order=1)
    Ay = np.asarray(_apply_separable(jnp.asarray(vol), Ws, perm), np.float64)
    Atx = np.asarray(_apply_separable(jnp.asarray(vals), Ws, perm, transpose=True), np.float64)
    assert Atx.shape == in_dim
    assert abs(np.sum(Ay * vals) - np.sum(Atx * vol)) < 1e-3


def test_non_separable_detected():
    mat = affine_matrix_classic([0, 0, 0, 0.1, 0, 0])
    assert separable_matrices(mat, (8, 8, 8), (8, 8, 8)) is None
