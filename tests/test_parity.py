"""Quality-parity harness: the reference demo protocol as a fixture.

Mirrors demos/demo_single_channel.ipynb cell 4 (BASELINE.md rows 1-2): GT at
1 mm -> 4 mm thick z-axis, Gaussian noise at sigma = 2.5% of the intensity
range (75/3000 on BrainWeb), even/odd scaling 0.1, fixed seed; reconstruct
and compare against the trilinear (max_iter=0-equivalent) baseline. The
reference anchors: MSE_SR / MSE_trilinear = 28621.78 / 35222.99 = 0.8126.
The full-size ratio is reported by bench.py ('sr_vs_trilinear'); this test
pins the same protocol at CI scale.
"""
import numpy as np
import jax.numpy as jnp

from phantoms import blob_phantom, degrade

from unires_tpu import Settings, init
from unires_tpu.ops.resample import affine_to_M, pull
from unires_tpu.pipeline.fit import fit as fit_solver


def _protocol(dim=(48, 48, 49), amplitude=3000.0, seed=0):
    gt = blob_phantom(dim=dim, n_blobs=10, amplitude=amplitude, seed=seed)
    x_obs, mat_x, _ = degrade(gt, thick_axis=2, thick=4.0, noise_sd=75.0,
                              scl=0.1, seed=seed,
                              rigid_params=[1.0, -0.5, 0.3, 0.01, -0.008, 0.01])
    return gt, x_obs, mat_x


def test_sr_beats_trilinear_demo_protocol():
    gt, x_obs, mat_x = _protocol()
    sett = Settings(vx=1.0, do_coreg=False, do_print=0, sched_num=3,
                    reg_scl=4.0, write_out=False, tolerance=1e-4,
                    scaling=True, max_iter=40)
    x, y, sett = init([[x_obs, mat_x]], sett)

    M = affine_to_M(np.linalg.solve(np.eye(4), y[0].mat))
    gt_on_y = np.asarray(pull(jnp.asarray(gt), M, y[0].dim))
    msk = gt_on_y > 0
    tri = np.asarray(y[0].dat)  # init reslice == the reference's max_iter=0
    mse_tri = float(np.mean((tri[msk] - gt_on_y[msk]) ** 2))

    y, R, jtv, obj, n = fit_solver(x, y, sett)
    rec = np.asarray(y[0].dat)
    mse_sr = float(np.mean((rec[msk] - gt_on_y[msk]) ** 2))
    ratio = mse_sr / mse_tri
    # reference anchor 0.8126 at full scale; the miniature protocol gives SR
    # a comparable edge — anything >= 1 means super-resolution lost
    assert ratio < 0.9, (mse_sr, mse_tri, ratio)

    # golden NLL-trace shape: posterior decreases monotonically WITHIN each
    # lambda-schedule segment (jumps only at schedule steps, where lambda
    # halves — reference run.py:140-155 / BASELINE.md golden traces)
    post = obj[:, 0]
    prior = obj[:, 2]
    # schedule steps show as >20% drops in the prior term
    steps = set(np.nonzero(prior[1:] < 0.8 * prior[:-1])[0] + 1)
    bad = [i for i in range(1, len(post))
           if i not in steps and post[i] > post[i - 1] * (1 + 1e-3)]
    assert not bad, (bad, post)


def test_rho_formula_matches_reference_anchor_c3():
    """Reference-derived determinism anchor (round-2 VERDICT item 6).

    The committed demo_multi_channel.ipynb run (BASELINE.md) prints the
    estimated hyper-parameters tau = (4.158e-4, 2.509e-4, 1.596e-4) and
    mu = (405.7, 1959, 4278) and the resulting ADMM step size rho = 0.8398.
    Feeding the SAME tau/mu through THIS implementation's lam0 formula
    (pipeline.format_y:112, reference _core.py:273-280), lambda schedule
    (reference _core.py:288-307, start 32 for sched_num=3 reg_scl=4) and
    step-size formula (solvers.admm.step_size, reference _update.py:35-64)
    must reproduce the reference's number — this pins the formula chain to
    the reference implementation, not to this repo itself.
    """
    import math
    import types

    from unires_tpu.pipeline.fit import get_sched
    from unires_tpu.solvers.admm import step_size

    taus = [4.158e-4, 2.509e-4, 1.596e-4]
    mus = [405.7, 1959.0, 4278.0]
    C = len(taus)
    x = [[types.SimpleNamespace(tau=t, mu=m, ct=False)]
         for t, m in zip(taus, mus)]
    y = [types.SimpleNamespace(lam0=math.sqrt(1.0 / C) / m, lam=None)
         for m in mus]
    sett = Settings(reg_scl=4.0, sched_num=3, rho=None, rho_scl=1.0)
    sett = get_sched(N=C, sett=sett)
    sched0 = float(np.atleast_1d(sett.reg_scl)[0])
    assert sched0 == 32.0  # descending powers of two ending at 4
    for yc in y:
        yc.lam = sched0 * yc.lam0
    rho = step_size(x, y, sett)
    assert abs(rho - 0.8398) < 2e-3, rho


def test_rho_formula_matches_reference_anchor_c1():
    """Single-channel anchor: demo_single_channel.ipynb prints rho = 2.0891
    (tau from sd = 49.04, mu ~ 406-410, single-entry schedule [4] since
    sched_num is forced to 0 for one observation)."""
    import math
    import types

    from unires_tpu.pipeline.fit import get_sched
    from unires_tpu.solvers.admm import step_size

    sd = 49.04
    tau = 1.0 / sd ** 2
    mu = 405.7
    x = [[types.SimpleNamespace(tau=tau, mu=mu, ct=False)]]
    y = [types.SimpleNamespace(lam0=1.0 / mu, lam=None)]
    sett = Settings(reg_scl=4.0, sched_num=3, rho=None, rho_scl=1.0)
    sett = get_sched(N=1, sett=sett)  # N=1 forces sched_num=0 -> [4.0]
    assert np.atleast_1d(sett.reg_scl).size == 1
    y[0].lam = float(np.atleast_1d(sett.reg_scl)[0]) * y[0].lam0
    rho = step_size(x, y, sett)
    # the notebook's exact mu for this run is not printed; 2% tolerance
    assert abs(rho - 2.0891) / 2.0891 < 0.02, rho


def test_tau_estimation_on_sigma_known_synthetic():
    """BASELINE determinism anchor: tau = 1/sd^2 recovered within a few %
    on a synthetic volume with KNOWN noise sd (the reference estimates
    sd 49.04 -> tau 4.158e-4 on its fixture; here the truth is constructed)."""
    from unires_tpu.pipeline.hyperpar import estimate_noise

    rng = np.random.default_rng(0)
    gt = blob_phantom(dim=(64, 64, 64), n_blobs=12, amplitude=3000.0, seed=1)
    # two well-separated intensity classes (the model the estimator fits);
    # the positive pedestal keeps the background class un-truncated (the
    # pipeline's dat >= 0 mask half-truncates zero-mean background noise,
    # which biases ANY estimator — the reference's included: its demo adds
    # sigma=75 and estimates sd 49.04 on magnitude-like data)
    sd_true = 75.0
    fg = np.where(gt > 500.0, 3000.0, 0.0).astype(np.float32)
    dat = 500.0 + fg + sd_true * rng.standard_normal(fg.shape).astype(
        np.float32)
    sd, _, _, _ = estimate_noise(jnp.asarray(dat))
    assert abs(sd - sd_true) / sd_true < 0.05, sd
    tau = 1.0 / sd ** 2
    assert abs(tau - 1.0 / sd_true ** 2) / (1.0 / sd_true ** 2) < 0.1
