"""CT-specific behavior (reference: rho forced 1, scaling off, negatives kept)."""
import numpy as np

from phantoms import blob_phantom, degrade

from unires_tpu import Settings, init
from unires_tpu.pipeline.fit import fit as fit_solver
from unires_tpu.solvers.admm import step_size


def test_ct_forces_rho_one_and_disables_scaling():
    gt = blob_phantom(dim=(24, 24, 25), amplitude=1000.0, seed=4) - 500.0
    x_obs, mat_x, _ = degrade(gt, thick_axis=2, thick=4.0, noise_sd=20.0, seed=4)
    sett = Settings(vx=1.0, ct=True, do_coreg=False, do_print=0, max_iter=6,
                    sched_num=0, write_out=False, scaling=True)
    x, y, sett = init([[x_obs, mat_x]], sett)
    assert x[0][0].ct
    # N=1 CT disables even/odd scaling (reference _core.py:262-264)
    assert sett.scaling is False
    # CT forces rho = 1 (reference _update.py:46-47)
    assert step_size(x, y, sett) == 1.0
    y, R, jtv, obj, n_iter = fit_solver(x, y, sett)
    assert np.isfinite(obj).all()
    # negatives must survive the pipeline (CT semantics)
    assert float(np.asarray(y[0].dat).min()) < 0


def test_plot_utils_headless(tmp_path):
    from unires_tpu.utils.plots import plot_convergence, show_slices

    obj = np.cumsum(-np.ones((5, 3)), axis=0) + 100
    fig = plot_convergence(obj, save_to=str(tmp_path / "conv.png"))
    assert (tmp_path / "conv.png").exists()
    vol = np.random.default_rng(0).random((10, 12, 14))
    show_slices(vol, title="t", save_to=str(tmp_path / "sl.png"))
    assert (tmp_path / "sl.png").exists()
