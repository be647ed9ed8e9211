"""Pallas shift-and-select kernels: interpret-mode equivalence + adjointness.

(The real-TPU behavior — including the hardware dynamic_rotate direction bug
and DMA alignment rules — is exercised by bench.py / the verify recipe; these
tests pin the kernel semantics against the XLA reference on CPU.)
"""
import contextlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from unires_tpu.geometry import affine_matrix_classic
from unires_tpu.ops.pallas_resample import (pallas_pull, pallas_push,
                                            plan_pull, plan_push)
from unires_tpu.ops.resample import affine_to_M, pull as xla_pull, push as xla_push

IN_DIM = (40, 44, 140)
OUT_DIM = (38, 42, 138)

AFFINES = [
    ("identity", np.eye(4)),
    ("shift", affine_matrix_classic([2.3, -1.7, 0.4])),
    ("smallrot", affine_matrix_classic([1.1, -0.6, 0.3, 0.02, -0.01, 0.015])),
]


@pytest.mark.parametrize("name,mat", AFFINES)
def test_pull_matches_xla(name, mat):
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random(IN_DIM, dtype=np.float32))
    M = affine_to_M(mat)
    plan = plan_pull(IN_DIM, OUT_DIM, mat[:3, :4])
    assert plan is not None
    with pltpu.force_tpu_interpret_mode():
        got = pallas_pull(vol, M, OUT_DIM, plan)
    want = xla_pull(vol, M, OUT_DIM)
    assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize("name,mat", AFFINES)
def test_push_matches_xla_and_adjoint(name, mat):
    rng = np.random.default_rng(1)
    vals = jnp.asarray(rng.random(OUT_DIM, dtype=np.float32))
    vol = jnp.asarray(rng.random(IN_DIM, dtype=np.float32))
    M = affine_to_M(mat)
    M4 = np.eye(4)
    M4[:3, :4] = np.asarray(M)
    Minv = jnp.asarray(np.linalg.inv(M4)[:3, :4].astype(np.float32))
    pplan = plan_push(OUT_DIM, IN_DIM, mat[:3, :4])
    fplan = plan_pull(IN_DIM, OUT_DIM, mat[:3, :4])
    assert pplan is not None
    with pltpu.force_tpu_interpret_mode():
        got = pallas_push(vals, M, Minv, IN_DIM, pplan)
        Ay = pallas_pull(vol, M, OUT_DIM, fplan)
    want = xla_push(vals, M, IN_DIM)
    # equal up to f32 rounding of the incremental weight evaluation
    scale = float(jnp.max(jnp.abs(want))) + 1e-6
    assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-4 * scale + 1e-5)
    # adjointness of the pallas pair
    lhs = float(jnp.sum(Ay * vals))
    rhs = float(jnp.sum(got * vol))
    assert abs(lhs - rhs) < 2e-5 * abs(lhs)


def test_plan_fallback_for_extreme_rotation():
    mat = affine_matrix_classic([0, 0, 0, 0.6, 0.6, 0.6])  # ~34 degrees
    assert plan_pull((64, 64, 256), (64, 64, 256), mat[:3, :4]) is None


@pytest.mark.parametrize("name,mat", AFFINES)
def test_pull_grad_matches_xla(name, mat):
    from unires_tpu.ops.pallas_resample import pallas_pull_grad
    from unires_tpu.ops.resample import pull_grad as xla_pull_grad

    rng = np.random.default_rng(2)
    vol = jnp.asarray(rng.random(IN_DIM, dtype=np.float32))
    M = affine_to_M(mat)
    plan = plan_pull(IN_DIM, OUT_DIM, mat[:3, :4])
    assert plan is not None
    with pltpu.force_tpu_interpret_mode():
        got = pallas_pull_grad(vol, M, OUT_DIM, plan)
    want = xla_pull_grad(vol, M, OUT_DIM)
    assert got.shape == want.shape
    # mask knife-edge sample points (fractional part within 1 ulp of an
    # integer): there the trilinear gradient flips between adjacent finite
    # differences and a single-FMA rounding difference between the two
    # paths legitimately changes the answer (measure-zero; same convention
    # caveat as the pull/push boundary note in ops.pallas_resample)
    Mn = np.asarray(M, np.float64)
    ii, jj, kk = np.meshgrid(*[np.arange(n) for n in OUT_DIM], indexing="ij")
    edge = np.zeros(OUT_DIM, bool)
    for d in range(3):
        g = Mn[d, 0] * ii + Mn[d, 1] * jj + Mn[d, 2] * kk + Mn[d, 3]
        fr = g - np.floor(g)
        edge |= (fr < 1e-5) | (fr > 1 - 1e-5)
    diff = np.abs(np.asarray(got) - np.asarray(want)).max(axis=-1)
    if np.all(diff < 1e-5):
        return  # exact agreement (e.g. integer affines: no rounding at all)
    assert np.all(diff[~edge] < 1e-5), diff[~edge].max()
    assert edge.mean() < 0.01  # the mask must stay measure-zero-ish


SHEAR_AFFINES = AFFINES + [
    ("bigrot", affine_matrix_classic([0.5, 0.2, -0.3, 0.045, -0.04, 0.03])),
]


@pytest.mark.parametrize("name,mat", SHEAR_AFFINES)
def test_pull_shear_matches_xla(name, mat):
    from unires_tpu.ops.pallas_resample import (pallas_pull_shear,
                                                plan_pull_shear)

    rng = np.random.default_rng(3)
    vol = jnp.asarray(rng.random(IN_DIM, dtype=np.float32))
    M = affine_to_M(mat)
    plan = plan_pull_shear(IN_DIM, OUT_DIM, np.asarray(mat)[:3, :4])
    assert plan is not None
    with pltpu.force_tpu_interpret_mode():
        got = pallas_pull_shear(vol, M, OUT_DIM, plan)
    want = xla_pull(vol, M, OUT_DIM)
    assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-5), \
        np.abs(np.asarray(got) - np.asarray(want)).max()


def test_pull_shear_drift_proof():
    """A plan built at IDENTITY stays exact for any pose within the rotation
    budget — the property the plain kernel lacks (drift windows)."""
    from unires_tpu.ops.pallas_resample import (pallas_pull_shear,
                                                plan_pull_shear)

    rng = np.random.default_rng(4)
    vol = jnp.asarray(rng.random(IN_DIM, dtype=np.float32))
    plan = plan_pull_shear(IN_DIM, OUT_DIM, np.eye(4)[:3, :4])
    for rot in (0.01, 0.03, 0.045):
        mat = affine_matrix_classic([0.5, -0.2, 0.3, rot, -rot, 0.7 * rot])
        M = affine_to_M(mat)
        with pltpu.force_tpu_interpret_mode():
            got = pallas_pull_shear(vol, M, OUT_DIM, plan)
        want = xla_pull(vol, M, OUT_DIM)
        assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-5), rot


@pytest.mark.parametrize("name,mat", SHEAR_AFFINES)
def test_push_shear_matches_xla_and_adjoint(name, mat):
    from unires_tpu.ops.pallas_resample import (pallas_pull_shear,
                                                pallas_push_shear,
                                                plan_pull_shear,
                                                plan_push_shear)

    rng = np.random.default_rng(5)
    vals = jnp.asarray(rng.random(OUT_DIM, dtype=np.float32))
    vol = jnp.asarray(rng.random(IN_DIM, dtype=np.float32))
    M = affine_to_M(mat)
    M4 = np.eye(4)
    M4[:3, :4] = np.asarray(M)
    Minv = jnp.asarray(np.linalg.inv(M4)[:3, :4].astype(np.float32))
    pplan = plan_push_shear(OUT_DIM, IN_DIM, np.asarray(mat)[:3, :4])
    fplan = plan_pull_shear(IN_DIM, OUT_DIM, np.asarray(mat)[:3, :4])
    assert pplan is not None and fplan is not None
    with pltpu.force_tpu_interpret_mode():
        got = pallas_push_shear(vals, M, Minv, IN_DIM, pplan)
        Ay = pallas_pull_shear(vol, M, OUT_DIM, fplan)
    want = xla_push(vals, M, IN_DIM)
    scale = float(jnp.max(jnp.abs(want))) + 1e-6
    assert np.allclose(np.asarray(got), np.asarray(want),
                       atol=1e-4 * scale + 1e-5)
    lhs = float(jnp.sum(Ay * vals))
    rhs = float(jnp.sum(got * vol))
    assert abs(lhs - rhs) < 2e-5 * abs(lhs)


def test_push_shear_drift_proof():
    from unires_tpu.ops.pallas_resample import (pallas_push_shear,
                                                plan_push_shear)

    rng = np.random.default_rng(6)
    vals = jnp.asarray(rng.random(OUT_DIM, dtype=np.float32))
    plan = plan_push_shear(OUT_DIM, IN_DIM, np.eye(4)[:3, :4])
    for rot in (0.01, 0.03, 0.045):
        mat = affine_matrix_classic([0.5, -0.2, 0.3, rot, -rot, 0.7 * rot])
        M = affine_to_M(mat)
        M4 = np.eye(4)
        M4[:3, :4] = np.asarray(M)
        Minv = jnp.asarray(np.linalg.inv(M4)[:3, :4].astype(np.float32))
        with pltpu.force_tpu_interpret_mode():
            got = pallas_push_shear(vals, M, Minv, IN_DIM, plan)
        want = xla_push(vals, M, IN_DIM)
        scale = float(jnp.max(jnp.abs(want))) + 1e-6
        assert np.allclose(np.asarray(got), np.asarray(want),
                           atol=1e-4 * scale + 1e-5), rot


def _grad_crossing_mask(mat, out_dim, eps=1e-4):
    """Elements whose sample coordinate sits within eps of an integer on any
    axis: the trilinear GRADIENT is discontinuous there (grad flips between
    v[i0+1]-v[i0] and the next cell), so f32 rounding differences between the
    XLA and Pallas index computations legitimately disagree (measure-zero;
    same family as the documented FOV knife-edge)."""
    ii, jj, kk = np.meshgrid(*(np.arange(d) for d in out_dim), indexing="ij")
    Mn = np.asarray(mat, np.float64)[:3, :4]
    near = np.zeros(out_dim, bool)
    for d in range(3):
        g = Mn[d, 0] * ii + Mn[d, 1] * jj + Mn[d, 2] * kk + Mn[d, 3]
        near |= np.abs(g - np.round(g)) < eps
    return near


@pytest.mark.parametrize("name,mat", SHEAR_AFFINES)
def test_pull_grad_shear_matches_xla(name, mat):
    from unires_tpu.ops.pallas_resample import (pallas_pull_grad_shear,
                                                plan_pull_shear)
    from unires_tpu.ops.resample import pull_grad as xla_pull_grad

    rng = np.random.default_rng(7)
    vol = jnp.asarray(rng.random(IN_DIM, dtype=np.float32))
    M = affine_to_M(mat)
    plan = plan_pull_shear(IN_DIM, OUT_DIM, np.asarray(mat)[:3, :4])
    assert plan is not None
    with pltpu.force_tpu_interpret_mode():
        got = pallas_pull_grad_shear(vol, M, OUT_DIM, plan)
    want = xla_pull_grad(vol, M, OUT_DIM)
    diff = np.abs(np.asarray(got) - np.asarray(want)).max(axis=-1)
    bad = diff > 1e-5
    cross = _grad_crossing_mask(mat, OUT_DIM)
    assert not (bad & ~cross).any(), diff[~cross].max()
    # the exemption must stay measure-zero-ish — except for integer affines
    # (e.g. identity), where every element is a crossing but none mismatch
    assert cross.mean() < 0.02 or not bad.any()


def test_pull_grad_shear_drift_proof():
    """Identity-built plan stays exact for poses within the rotation budget
    (the property that lifts the fit pose budget to the DMA cover)."""
    from unires_tpu.ops.pallas_resample import (pallas_pull_grad_shear,
                                                plan_pull_shear)
    from unires_tpu.ops.resample import pull_grad as xla_pull_grad

    rng = np.random.default_rng(8)
    vol = jnp.asarray(rng.random(IN_DIM, dtype=np.float32))
    plan = plan_pull_shear(IN_DIM, OUT_DIM, np.eye(4)[:3, :4])
    for rot in (0.01, 0.03, 0.045):
        mat = affine_matrix_classic([0.5, -0.2, 0.3, rot, -rot, 0.7 * rot])
        M = affine_to_M(mat)
        with pltpu.force_tpu_interpret_mode():
            got = pallas_pull_grad_shear(vol, M, OUT_DIM, plan)
        want = xla_pull_grad(vol, M, OUT_DIM)
        diff = np.abs(np.asarray(got) - np.asarray(want)).max(axis=-1)
        bad = diff > 1e-5
        cross = _grad_crossing_mask(mat, OUT_DIM)
        assert not (bad & ~cross).any(), (rot, diff[~cross].max())
