"""Checkpoint/resume: interrupted fit continues to the same answer."""
import numpy as np

from phantoms import blob_phantom, degrade

from unires_tpu import Settings, init
from unires_tpu.pipeline.fit import fit as fit_solver


def _problem(tmp_path, **kw):
    gt = blob_phantom(dim=(24, 24, 25), amplitude=1000.0, seed=2)
    x_obs, mat_x, _ = degrade(gt, thick_axis=2, thick=4.0, noise_sd=30.0, seed=2)
    sett = Settings(vx=1.0, do_coreg=False, do_print=0, sched_num=0,
                    reg_scl=4.0, write_out=False, tolerance=1e-4, **kw)
    x, y, sett = init([[x_obs, mat_x]], sett)
    return gt, x, y, sett


def test_resume_matches_uninterrupted(tmp_path):
    ckpt = str(tmp_path / "state.npz")

    # uninterrupted run: 12 iterations
    gt, x, y, sett = _problem(tmp_path, max_iter=12)
    y_full, _, _, obj_full, _ = fit_solver(x, y, sett)
    ref = np.asarray(y_full[0].dat)

    # interrupted at 6, checkpointing every 3
    gt, x, y, sett = _problem(tmp_path, max_iter=6, checkpoint_every=3,
                              checkpoint_path=ckpt)
    fit_solver(x, y, sett)

    # resume to 12
    gt, x, y, sett = _problem(tmp_path, max_iter=12, checkpoint_every=3,
                              checkpoint_path=ckpt, resume=True)
    y_res, _, _, obj_res, n_done = fit_solver(x, y, sett)
    got = np.asarray(y_res[0].dat)

    scale = np.abs(ref).max()
    assert np.allclose(got, ref, atol=1e-3 * scale), np.abs(got - ref).max()


def test_checkpoint_roundtrip_state(tmp_path):
    from unires_tpu.pipeline.checkpoint import (load_checkpoint,
                                                save_checkpoint, restore_into)
    import jax.numpy as jnp

    ckpt = str(tmp_path / "s.npz")
    gt, x, y, sett = _problem(tmp_path, max_iter=2)
    z = jnp.ones((1, 3) + y[0].dim, jnp.float32)
    w = 2 * z
    x[0][0].rigid_q = np.array([0.1, 0.2, 0.3, 0.001, 0.002, 0.003])
    x[0][0].po.scl = 0.05
    save_checkpoint(ckpt, x, y, z, w, dict(
        rho=1.5, cnt_scl=1, cnt_scl_iter=4, n_iter=7, countdown0=5,
        countdown1=2, obj_trace=np.ones((3, 3))))
    z2, w2, st = restore_into(load_checkpoint(ckpt), x, y)
    assert np.allclose(np.asarray(z2), np.asarray(z))
    assert st["rho"] == 1.5 and st["n_iter"] == 7 and st["cnt_scl"] == 1
    assert x[0][0].po.scl == 0.05
    assert len(st["obj_trace"]) == 3
