"""End-to-end solver tests on synthetic phantoms (the reference validates via
exactly this simulate-degrade-reconstruct loop, demos/demo_single_channel)."""
import jax.numpy as jnp
import numpy as np
import pytest

from phantoms import blob_phantom, degrade

from unires_tpu import Settings, init
from unires_tpu.pipeline.fit import fit as fit_solver, get_sched, get_gain


def _mse(a, b):
    return float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))


@pytest.fixture(scope="module")
def recon_problem():
    gt = blob_phantom(dim=(40, 40, 41), amplitude=1000.0, seed=0)
    x_obs, mat_x, po = degrade(gt, thick_axis=2, thick=4.0, noise_sd=50.0, seed=0)
    return gt, x_obs, mat_x


def test_super_resolution_beats_trilinear(recon_problem):
    gt, x_obs, mat_x = recon_problem
    sett = Settings(vx=1.0, do_coreg=False, do_print=0, max_iter=60,
                    tolerance=1e-4, sched_num=1, reg_scl=4.0, write_out=False,
                    unified_rigid=False)
    x, y, sett = init([[x_obs, mat_x]], sett)
    assert sett.method == "super-resolution"
    # trilinear baseline = the initial y (averaged linear reslice, ref _init_y_dat)
    # evaluate on the GT grid: y grid == gt grid here (mean space of 1 vol @1mm)
    assert tuple(y[0].dim) == gt.shape
    mse_tri = _mse(y[0].dat, gt)
    y, R, jtv, obj, n_iter = fit_solver(x, y, sett)
    mse_sr = _mse(y[0].dat, gt)
    assert n_iter > 5
    # NLL decreasing (allow tiny numeric wiggle)
    nl = obj[:, 0]
    assert nl[-1] < nl[0]
    viol = np.diff(nl) > np.abs(nl[0]) * 1e-4
    assert viol.mean() < 0.2, f"too many NLL increases: {np.nonzero(viol)}"
    # super-resolution must beat trilinear (reference: 28621 vs 35222)
    assert mse_sr < 0.8 * mse_tri, (mse_sr, mse_tri)


def test_denoising_path(recon_problem):
    gt, *_ = recon_problem
    rng = np.random.default_rng(3)
    noisy = gt + 100.0 * rng.standard_normal(gt.shape).astype(np.float32)
    sett = Settings(vx=0, do_coreg=False, do_print=0, max_iter=40,
                    tolerance=1e-4, sched_num=0, reg_scl=4.0, write_out=False)
    x, y, sett = init([[noisy, np.eye(4)]], sett)
    assert sett.method == "denoising"
    y, R, jtv, obj, n_iter = fit_solver(x, y, sett)
    mse_dn = _mse(y[0].dat, gt)
    mse_noisy = _mse(noisy, gt)
    assert mse_dn < 0.6 * mse_noisy, (mse_dn, mse_noisy)


def test_multichannel_jtv_coupling(recon_problem):
    # two channels of the same anatomy: joint prior should help both
    gt1 = blob_phantom(dim=(32, 32, 33), amplitude=1000.0, seed=1)
    gt2 = 2000.0 - gt1  # inverted contrast, same edges
    xs = []
    for g, s in ((gt1, 10), (gt2, 20)):
        x_obs, mat_x, _ = degrade(g, thick_axis=2, thick=4.0, noise_sd=50.0, seed=s)
        xs.append([x_obs, mat_x])
    sett = Settings(vx=1.0, do_coreg=False, do_print=0, max_iter=40,
                    tolerance=1e-4, sched_num=1, write_out=False)
    x, y, sett = init(xs, sett)
    assert len(y) == 2
    mse_tri = [_mse(y[c].dat, g) for c, g in enumerate((gt1, gt2))]
    y, R, jtv, obj, n_iter = fit_solver(x, y, sett)
    for c, g in enumerate((gt1, gt2)):
        assert _mse(y[c].dat, g) < mse_tri[c]


def test_get_sched():
    sett = Settings(reg_scl=4.0, sched_num=3)
    sett = get_sched(3, sett)
    assert np.allclose(sett.reg_scl, [32.0, 16.0, 8.0, 4.0])
    sett2 = Settings(reg_scl=4.0, sched_num=3)
    sett2 = get_sched(1, sett2)  # N=1 -> no schedule
    assert np.allclose(sett2.reg_scl, [4.0])
    sett3 = Settings(reg_scl=[10.0, 5.0, 1.0], sched_num=3)
    sett3 = get_sched(3, sett3)
    assert np.allclose(sett3.reg_scl, [10.0, 5.0, 1.0])


def test_get_gain():
    assert get_gain([5.0]) == float("inf")
    g = get_gain([10.0, 6.0, 5.0])
    assert abs(g - (6.0 - 5.0) / 5.0) < 1e-12


def test_precond_modes_agree(recon_problem):
    """dct / jacobi / none preconditioning must converge to the same
    reconstruction (the preconditioner changes the CG trajectory, not the
    solution). 'jacobi' mirrors the reference's shipped-but-disabled
    _precond (unires/_update.py:80-102) for A/B parity runs."""
    gt, x_obs, mat_x = recon_problem
    outs = {}
    for mode in ("dct", "jacobi", "none"):
        sett = Settings(vx=1.0, do_coreg=False, do_print=0, max_iter=12,
                        tolerance=1e-9, sched_num=0, reg_scl=4.0,
                        write_out=False, unified_rigid=False, precond=mode,
                        cgs_max_iter=40, cgs_tol=1e-8)
        x, y, sett = init([[x_obs, mat_x]], sett)
        y, _, _, obj, _ = fit_solver(x, y, sett)
        outs[mode] = (np.asarray(y[0].dat, np.float64), obj[-1, 0])
    ref, nll_ref = outs["dct"]
    scale = np.abs(ref).max()
    for mode in ("jacobi", "none"):
        dat, nll = outs[mode]
        assert np.abs(dat - ref).max() < 5e-3 * scale, mode
        assert abs(nll - nll_ref) < 1e-3 * abs(nll_ref), mode
