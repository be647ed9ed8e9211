"""Gauss-Newton sub-solver tests: even/odd scaling and rigid pose recovery.

Oracles: finite differences of the matching term (the reference pins the
scaling grad/Hessian to derivations/scaling.m, and the rigid chain rule to
unires/_update.py:615-664)."""
import jax.numpy as jnp
import numpy as np

from phantoms import blob_phantom, degrade

from unires_tpu import Settings, init
from unires_tpu.geometry import affine_basis, expm
from unires_tpu.pipeline.fit import fit as fit_solver
from unires_tpu.solvers.admm import obs_dyn_args
from unires_tpu.solvers.scaling_gn import make_scaling_fns, update_scaling
from unires_tpu.solvers.rigid import update_rigid


def _problem(scl_true=0.0, rigid_true=None, noise=20.0, dim=(32, 32, 33), seed=0):
    gt = blob_phantom(dim=dim, amplitude=1000.0, seed=seed)
    x_obs, mat_x, po = degrade(gt, thick_axis=2, thick=4.0, noise_sd=noise,
                               scl=scl_true, rigid_params=rigid_true, seed=seed)
    sett = Settings(vx=1.0, do_coreg=False, do_print=0, max_iter=6,
                    tolerance=1e-4, sched_num=0, reg_scl=4.0, write_out=False,
                    scaling=False, unified_rigid=False)
    x, y, sett = init([[x_obs, mat_x]], sett)
    return gt, x, y, sett


def test_scaling_gradient_matches_finite_difference():
    gt, x, y, sett = _problem(scl_true=0.12)
    o = x[0][0]
    project, stats, ll_at = make_scaling_fns(o.po, sett.method)
    M, _ = obs_dyn_args(o.po, sett.method, o.po.rigid)
    dat_y0 = project(y[0].dat, M)
    tau = jnp.float32(o.tau)
    s0 = 0.04
    ll, gr, hes = stats(dat_y0, o.dat, jnp.float32(s0), tau)
    eps = 1e-3
    lp = float(ll_at(dat_y0, o.dat, jnp.float32(s0 + eps), tau))
    lm = float(ll_at(dat_y0, o.dat, jnp.float32(s0 - eps), tau))
    fd = (lp - lm) / (2 * eps)
    assert np.isfinite(float(gr))
    assert abs(float(gr) - fd) < 0.05 * max(abs(fd), 1.0), (float(gr), fd)
    assert float(hes) > 0


def test_scaling_update_recovers_true_scale():
    # with a perfect reconstruction the GN step lands on the true scale
    scl_true = 0.15
    gt, x, y, sett = _problem(scl_true=scl_true, noise=5.0)
    y[0].dat = jnp.asarray(gt)
    for _ in range(3):
        x, ll = update_scaling(x, y, sett, max_niter_gn=1, num_linesearch=6)
    est = x[0][0].po.scl
    assert abs(est - scl_true) < 0.01, (est, scl_true)


def test_scaling_interleaved_with_fit():
    # the pipeline interleaves scaling updates with ADMM (reference
    # run.py:115-122): the joint fit should move the estimate toward truth
    scl_true = 0.15
    gt, x, y, sett = _problem(scl_true=scl_true, noise=5.0)
    sett.scaling = True
    sett.max_iter = 12
    y, *_ = fit_solver(x, y, sett)
    est = x[0][0].po.scl
    assert 0.2 * scl_true < est < 2.0 * scl_true, (est, scl_true)


def test_rigid_update_recovers_true_pose():
    # simulate with a small true rigid motion; with a known reconstruction
    # the GN update must recover it. (For N=1 with a *fitted* recon the pose
    # is unidentifiable — the reference disables unified_rigid for N=1,
    # unires/_core.py:192-195.)
    rigid_true = [1.0, -0.8, 0.6, 0.015, -0.01, 0.012]
    gt, x, y, sett = _problem(rigid_true=rigid_true, noise=5.0)
    y[0].dat = jnp.asarray(gt)
    o = x[0][0]
    lls = []
    for _ in range(6):
        x, ll = update_rigid(x, y, sett, mean_correct=False, max_niter_gn=1,
                             num_linesearch=6, samp=0)
        lls.append(ll)
    assert lls[-1] < 0.5 * lls[0], lls
    from unires_tpu.geometry import affine_matrix_classic

    # po.rigid is the world transform (centre-conjugated q, round 4)
    R_est = np.asarray(o.po.rigid, np.float64)
    R_true = affine_matrix_classic(rigid_true)
    assert np.allclose(R_est[:3, 3], R_true[:3, 3], atol=0.05), (
        R_est[:3, 3], R_true[:3, 3])
    assert np.allclose(R_est[:3, :3], R_true[:3, :3], atol=2e-3)


def test_rigid_mean_correction():
    gt, x, y, sett = _problem()
    x[0][0].rigid_q = np.array([1.0, 2.0, 3.0, 0.01, 0.02, 0.03])
    x, _ = update_rigid(x, y, sett, mean_correct=True, max_niter_gn=0,
                        num_linesearch=0, samp=0)
    # with a single observation, mean correction zeroes the parameters
    assert np.allclose(x[0][0].rigid_q, 0.0, atol=1e-12)
