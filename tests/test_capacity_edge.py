"""Knife-edge tests: shear kernels evaluated AT their capacity margins.

The window plans promise exactness for any dynamic pose the capacity checks
accept (models.forward capacity_ok); the fit loop's veto enforces that
boundary at runtime.  These tests probe poses whose dynamic spans sit just
INSIDE the caps — the region ordinary drift tests never reach — so any
trimming of the plan slack (docs/ROADMAP.md item: the 2.5-voxel shear
reserve) is caught here before it can corrupt a production run.
"""
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from unires_tpu.geometry import affine_matrix_classic
from unires_tpu.ops.pallas_resample import (
    dyn_l1, dyn_span, dyn_span_shear, pallas_pull_grad_shear,
    pallas_pull_shear, pallas_push_shear, plan_capacity_pull_shear,
    plan_capacity_push_shear, plan_pull_shear, plan_push_shear)
from unires_tpu.ops.resample import (affine_to_M, pull as xla_pull,
                                     pull_grad as xla_pull_grad,
                                     push as xla_push)

IN_DIM = (40, 44, 140)
OUT_DIM = (38, 42, 138)
NOMINAL = affine_matrix_classic([0.3, -0.2, 0.1, 0.01, -0.01, 0.008])


pytestmark = pytest.mark.slow  # interpret-mode kernel sweeps / full fits


def _margins_pull(plan, M):
    tile, wcap, ccap = plan_capacity_pull_shear(plan)
    hw = np.asarray(wcap) - np.asarray(dyn_span_shear(jnp.asarray(M), tile))
    hc = np.asarray(ccap) - np.asarray(dyn_span(jnp.asarray(M), tile))[:2]
    return min(hw.min(), hc.min())

def _margins_push(plan, Minv):
    tile, wcap, l1cap, ccap = plan_capacity_push_shear(plan)
    Minvj = jnp.asarray(Minv)
    hw = np.asarray(wcap) - np.asarray(dyn_span_shear(Minvj, tile))
    hl = np.asarray(l1cap) - 1e-4 - np.asarray(dyn_l1(Minvj))
    hc = np.asarray(ccap) - np.asarray(dyn_span(Minvj, tile))[:2]
    return min(hw.min(), hl.min(), hc.min())


def _edge_poses(plan, is_push):
    """Poses with small positive capacity margin, found by scaling rotations
    up until the margin crosses zero (per rotation family)."""
    out = []
    for axes in ([0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0],
                 [0.6, 0.5, 0.6]):
        lo, hi = 0.0, 0.8
        for _ in range(40):  # bisection on the largest accepted angle
            mid = 0.5 * (hi + lo)
            mat = affine_matrix_classic(
                [1.2, -0.8, 0.6] + [mid * a for a in axes])
            M = np.asarray(affine_to_M(mat))
            M4 = np.eye(4)
            M4[:3, :4] = M
            arg = np.linalg.inv(M4)[:3, :4].astype(np.float32) if is_push \
                else M
            m = (_margins_push(plan, arg) if is_push
                 else _margins_pull(plan, arg))
            if m > 0:
                lo = mid
            else:
                hi = mid
        if lo > 0:
            mat = affine_matrix_classic(
                [1.2, -0.8, 0.6] + [0.98 * lo * a for a in axes])
            out.append(mat)
    assert out, "no edge poses found (caps degenerate?)"
    return out


def test_pull_and_grad_exact_at_capacity_edge():
    fplan = plan_pull_shear(IN_DIM, OUT_DIM, NOMINAL[:3, :4])
    assert fplan is not None
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random(IN_DIM, dtype=np.float32))
    for mat in _edge_poses(fplan, is_push=False):
        M = affine_to_M(mat)
        assert _margins_pull(fplan, np.asarray(M)) > 0
        with pltpu.force_tpu_interpret_mode():
            got = pallas_pull_shear(vol, M, OUT_DIM, fplan)
            gotg = pallas_pull_grad_shear(vol, M, OUT_DIM, fplan)
        want = xla_pull(vol, M, OUT_DIM)
        assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-5), \
            np.abs(np.asarray(got) - np.asarray(want)).max()
        wantg = xla_pull_grad(vol, M, OUT_DIM)
        # gradient is discontinuous at integer crossings: compare away from
        # them via the 99.9th percentile AND a zero count of gross errors
        diff = np.abs(np.asarray(gotg) - np.asarray(wantg)).max(axis=-1)
        assert float(np.percentile(diff, 99.9)) <= 1e-4
        assert int((diff > 0.5).sum()) == 0


def test_random_poses_within_capacity_exact():
    """Property: ANY pose the capacity checks accept runs exactly.

    The 2026-08 slack trim (plan shear_sl 2.5 -> 1.5 on the back of the
    exact per-w anchor minimum) is safe only if this holds for arbitrary
    floor alignments — random TRANSLATIONS are what move the sample
    coordinates across integer boundaries, a surface the fixed-translation
    edge bisection above never varies."""
    in_dim, out_dim = (26, 30, 130), (24, 28, 130)
    fplan = plan_pull_shear(in_dim, out_dim, NOMINAL[:3, :4])
    pplan = plan_push_shear(out_dim, in_dim, NOMINAL[:3, :4])
    assert fplan is not None and pplan is not None
    rng = np.random.default_rng(7)
    vol = jnp.asarray(rng.random(in_dim, dtype=np.float32))
    vals = jnp.asarray(rng.random(out_dim, dtype=np.float32))
    n_pull = n_push = 0
    for trial in range(24):
        mat = affine_matrix_classic(
            rng.uniform(-2.5, 2.5, 3).tolist()
            + rng.uniform(-0.06, 0.06, 3).tolist())
        M = affine_to_M(mat)
        Mnp = np.asarray(M)
        M4 = np.eye(4)
        M4[:3, :4] = Mnp
        Minv_np = np.linalg.inv(M4)[:3, :4].astype(np.float32)
        if _margins_pull(fplan, Mnp) > 0 and n_pull < 8:
            n_pull += 1
            with pltpu.force_tpu_interpret_mode():
                got = pallas_pull_shear(vol, M, out_dim, fplan)
            want = xla_pull(vol, M, out_dim)
            assert np.allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5), (trial, mat)
        if _margins_push(pplan, Minv_np) > 0 and n_push < 8:
            n_push += 1
            Minv = jnp.asarray(Minv_np)
            with pltpu.force_tpu_interpret_mode():
                got = pallas_push_shear(vals, M, Minv, in_dim, pplan)
            want = xla_push(vals, M, in_dim)
            scale = float(jnp.max(jnp.abs(want))) + 1e-6
            assert np.allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4 * scale + 1e-5), (trial, mat)
    assert n_pull >= 4 and n_push >= 4, (n_pull, n_push)


def test_push_exact_at_capacity_edge():
    pplan = plan_push_shear(OUT_DIM, IN_DIM, NOMINAL[:3, :4])
    assert pplan is not None
    rng = np.random.default_rng(1)
    vals = jnp.asarray(rng.random(OUT_DIM, dtype=np.float32))
    for mat in _edge_poses(pplan, is_push=True):
        M = affine_to_M(mat)
        M4 = np.eye(4)
        M4[:3, :4] = np.asarray(M)
        Minv = jnp.asarray(np.linalg.inv(M4)[:3, :4].astype(np.float32))
        with pltpu.force_tpu_interpret_mode():
            got = pallas_push_shear(vals, M, Minv, IN_DIM, pplan)
        want = xla_push(vals, M, IN_DIM)
        scale = float(jnp.max(jnp.abs(want))) + 1e-6
        assert np.allclose(np.asarray(got), np.asarray(want),
                           atol=2e-4 * scale + 1e-5), \
            np.abs(np.asarray(got) - np.asarray(want)).max() / scale
