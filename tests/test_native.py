"""Native C++ resampling trio vs the JAX implementations."""
import shutil

import jax.numpy as jnp
import numpy as np
import pytest

if shutil.which("g++") is None:
    pytest.skip("no g++ in environment", allow_module_level=True)

from unires_tpu.geometry import affine_matrix_classic
from unires_tpu.native import pull_np, push_np, pull_grad_np
from unires_tpu.ops.resample import affine_to_M, pull, push, pull_grad

AFFINES = [
    np.eye(4),
    affine_matrix_classic([2.3, -1.7, 0.4]),
    affine_matrix_classic([1.0, 0.0, -2.0, 0.04, -0.08, 0.06]),
]


@pytest.mark.parametrize("mat", AFFINES)
@pytest.mark.parametrize("order", [0, 1])
def test_native_pull_matches_jax(mat, order):
    rng = np.random.default_rng(0)
    vol = rng.random((17, 19, 23), dtype=np.float32)
    out_dim = (15, 18, 21)
    M = np.asarray(mat[:3, :4], np.float32)
    got = pull_np(vol, M, out_dim, order=order)
    want = np.asarray(pull(jnp.asarray(vol), affine_to_M(mat), out_dim, order=order))
    frac_diff = np.mean(~np.isclose(got, want, atol=1e-5))
    assert frac_diff < (5e-3 if order == 0 else 1e-6), frac_diff


@pytest.mark.parametrize("mat", AFFINES)
def test_native_push_matches_jax_and_adjoint(mat):
    rng = np.random.default_rng(1)
    in_dim, out_dim = (17, 19, 23), (15, 18, 21)
    vol = rng.random(in_dim, dtype=np.float32)
    vals = rng.random(out_dim, dtype=np.float32)
    M = np.asarray(mat[:3, :4], np.float32)
    got = push_np(vals, M, in_dim)
    want = np.asarray(push(jnp.asarray(vals), affine_to_M(mat), in_dim))
    assert np.allclose(got, want, atol=1e-4), np.abs(got - want).max()
    Ay = pull_np(vol, M, out_dim)
    assert abs(float((Ay * vals).sum()) - float((got * vol).sum())) < 1e-2


def test_native_pull_grad_matches_jax():
    rng = np.random.default_rng(2)
    mat = AFFINES[2]
    vol = rng.random((16, 17, 18), dtype=np.float32)
    out_dim = (14, 15, 16)
    M = np.asarray(mat[:3, :4], np.float32)
    got = pull_grad_np(vol, M, out_dim)
    want = np.asarray(pull_grad(jnp.asarray(vol), affine_to_M(mat), out_dim))
    assert np.allclose(got, want, atol=1e-4), np.abs(got - want).max()
