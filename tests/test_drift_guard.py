"""Rigid-drift guard: the Pallas window plans' capacity veto.

Round-1's high-severity finding (ADVICE.md): rigid poses drifting past the
planned windows silently corrupted A/At. The guard has two parts — additive
plan slack (a ~±0.03 rad budget) and a device-side candidate check
(models.forward.make_resample_suite capacity_ok) that the fit loop's rigid
line search uses to REJECT out-of-budget moves. These tests drive poses past
the budget and observe rejection instead of a wrong answer.
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from unires_tpu.geometry import affine_diag, affine_matrix_classic
from unires_tpu.models.forward import make_resample_suite
from unires_tpu.models.proj_op import proj_info
from unires_tpu.ops.lie import inv44


pytestmark = pytest.mark.slow  # interpret-mode kernel sweeps / full fits


def _suite_pallas(po, method="super-resolution"):
    os.environ["UNIRES_TPU_BACKEND"] = "pallas"
    try:
        return make_resample_suite(po, method)
    finally:
        os.environ.pop("UNIRES_TPU_BACKEND", None)


def _maps(po, rigid):
    M = po.M_sr(rigid)
    M4 = np.eye(4)
    M4[:3, :4] = M
    return (jnp.asarray(M), jnp.asarray(
        np.linalg.inv(M4)[:3, :4].astype(np.float32)))


def test_capacity_ok_within_and_beyond_budget():
    po = proj_info((40, 44, 140), np.eye(4), (40, 44, 35),
                   affine_diag([1, 1, 4]), prof_ip=2, prof_tp=0)
    suite = _suite_pallas(po)
    assert suite["pallas"] == (True, True)

    # nominal pose: comfortably inside
    M, Minv = _maps(po, np.eye(4))
    assert bool(suite["capacity_ok"](M, Minv))
    # small drift (~0.01 rad): inside the ±0.03 budget
    M, Minv = _maps(po, affine_matrix_classic([0.5, -0.3, 0.2,
                                               0.007, -0.005, 0.007]))
    assert bool(suite["capacity_ok"](M, Minv))
    # far beyond the budget (~0.3 rad): must be vetoed
    M, Minv = _maps(po, affine_matrix_classic([0, 0, 0, 0.3, 0.0, 0.0]))
    assert not bool(suite["capacity_ok"](M, Minv))
    # large translations alone are FREE (dynamic per-tile anchors)
    M, Minv = _maps(po, affine_matrix_classic([25.0, -18.0, 11.0]))
    assert bool(suite["capacity_ok"](M, Minv))


def test_margin_decreases_with_rotation():
    po = proj_info((40, 44, 140), np.eye(4), (40, 44, 35),
                   affine_diag([1, 1, 4]), prof_ip=2, prof_tp=0)
    suite = _suite_pallas(po)
    margins = []
    for rot in (0.0, 0.01, 0.02, 0.05):
        M, Minv = _maps(po, affine_matrix_classic([0, 0, 0, rot, 0, 0]))
        margins.append(float(np.asarray(suite["margin"](M, Minv)).min()))
    assert margins[0] > margins[1] > margins[2] > margins[3]
    assert margins[0] > 0


def test_host_margin_mirror_matches_device():
    """replan_margins (host numpy) must agree with the device margin."""
    import types

    from unires_tpu.solvers.fitloop import plan_signature, replan_margins

    po = proj_info((40, 44, 140), np.eye(4), (40, 44, 35),
                   affine_diag([1, 1, 4]), prof_ip=2, prof_tp=0)
    suite = _suite_pallas(po)
    sett = types.SimpleNamespace(method="super-resolution", rigid_basis=None)
    x = [[types.SimpleNamespace(po=po)]]
    q = np.zeros((1, 6))
    q[0, 4] = 0.015  # ~0.011 rad about y
    os.environ["UNIRES_TPU_BACKEND"] = "pallas"
    try:
        plans = plan_signature(x, sett, q)
        host_m = replan_margins(x, sett, q, plans=plans)
    finally:
        os.environ.pop("UNIRES_TPU_BACKEND", None)
    from unires_tpu.geometry import affine_basis, expm

    R = expm(q[0], affine_basis("SE"))
    M, Minv = _maps(po, R)
    dev_m = float(np.asarray(suite["margin"](M, Minv)).min())
    assert abs(host_m - dev_m) < 1e-3, (host_m, dev_m)


def test_veto_saturation_escalates_budget_and_converges(capsys):
    """A true pose BEYOND the Pallas plan budget (~+-0.05 rad + cover slack)
    is reached via the self-healing path: the device counts capacity-vetoed
    line-search candidates, the host observes saturation in consecutive
    chunks, widens every window plan (extra_budget) and rebuilds — visible
    as a re-plan log line — and the GN then walks to the true pose (round-2
    VERDICT item 4: saturation used to be silent and permanent).

    Runs the REAL Pallas kernels under interpret mode on a small problem.
    """
    from jax.experimental.pallas import tpu as pltpu

    from phantoms import blob_phantom, degrade
    from unires_tpu import Settings, init
    from unires_tpu.geometry import affine_basis, expm
    from unires_tpu.pipeline.fit import fit as fit_solver

    # rotation about X: couples the z (lane, 128-wide) tile axis into y, so
    # the DMA-cover capacity actually binds (a lane-axis rotation only mixes
    # the two 8-wide tile axes and stays within any budget). Gauge
    # mean-centring splits the relative rotation across BOTH observations
    # (each carries ~rot/2), so the driven misalignment must be ~2x the
    # budget to saturate.
    # 0.32 rad: with the round-4 exact per-w anchors the DMA-cover budget
    # admits ~0.09 rad/observation + the 0.05 escalation step, so a 0.2 rad
    # relative rotation (~0.1 each after gauge centring) sometimes walks in
    # WITHOUT consecutive-chunk saturation and the escalation path never
    # fires (observed flaky). ~0.16/observation keeps the first plan
    # genuinely pinned until the budget escalates.
    rot = 0.32
    rp = [0.6, -0.4, 0.2, rot, 0.0, 0.0]
    true_R = affine_matrix_classic(rp)
    gt = blob_phantom(dim=(24, 24, 25), amplitude=1000.0, seed=3)
    x0, m0, _ = degrade(gt, thick_axis=2, thick=4.0, noise_sd=5.0, seed=3)
    x1, m1, _ = degrade(gt, thick_axis=1, thick=4.0, noise_sd=5.0, seed=4,
                        rigid_params=rp)
    # cgs_max_iter=4: the y-subproblem's accuracy is irrelevant here (the
    # assertion is about the POSE path), and interpret-mode pull/push in the
    # CG body dominate this test's runtime (1049 s -> ~6 min on 1 CPU)
    sett = Settings(vx=1.0, do_coreg=False, do_print=1, sched_num=0,
                    reg_scl=4.0, write_out=False, tolerance=1e-4,
                    max_iter=24, unified_rigid=True, chunk_iters=4,
                    cgs_max_iter=4)
    os.environ["UNIRES_TPU_BACKEND"] = "pallas"
    try:
        x, y, sett = init([[[x0, m0], [x1, m1]]], sett)
        with pltpu.force_tpu_interpret_mode():
            fit_solver(x, y, sett)
    finally:
        os.environ.pop("UNIRES_TPU_BACKEND", None)
    out = capsys.readouterr().out
    assert "capacity-vetoed rigid candidate" in out
    assert "re-planning resampling windows" in out
    R0 = expm(x[0][0].rigid_q, affine_basis("SE"))
    R1 = expm(x[0][1].rigid_q, affine_basis("SE"))
    rel = R1 @ np.linalg.inv(R0)
    cosang = (np.trace(rel[:3, :3]) - 1.0) / 2.0
    got_rot = float(np.arccos(np.clip(cosang, -1, 1)))
    # must have crossed the original budget edge and approach the truth
    assert got_rot > 0.13, got_rot
    assert np.abs(rel[:3, :3] - true_R[:3, :3]).max() < 0.03, rel
