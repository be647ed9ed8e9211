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
