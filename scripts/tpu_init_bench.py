"""Init-only benchmark at the production bench geometry (real TPU).

Builds the exact 3-channel workload bench.py uses and times ``init`` alone
(read -> hyperpar -> coreg -> format_y -> init_y), printing the per-stage
breakdown (set by UNIRES_TPU_TIMING=1 here) and one summary line. Round-3
VERDICT item 4: init must reach <= 10 s warm / <= 60 s cold; this script is
the fast (~40 s) probe for iterating on that without paying a full bench.
"""
import os
import sys
import time

import numpy as np

os.environ.setdefault("UNIRES_TPU_TIMING", "1")


def main():
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from tests.phantoms import blob_phantom
    from unires_tpu import Settings, init
    from unires_tpu.geometry import affine_matrix_classic, affine_diag
    from unires_tpu.models.forward import proj_apply
    from unires_tpu.models.proj_op import proj_info

    dim_y = (181, 217, 181)
    rng = np.random.default_rng(0)
    gt = blob_phantom(dim=dim_y, n_blobs=24, amplitude=2000.0, seed=0)
    gtj = jnp.asarray(gt)
    np.asarray(jnp.ones(8) + 1)  # warm the transfer path

    chans = []
    for c, ax in enumerate([2, 1, 0]):
        vx = [1.0, 1.0, 1.0]
        vx[ax] = 4.0
        mat_x = affine_diag(vx)
        dim_x = list(dim_y)
        dim_x[ax] = int(np.ceil(dim_y[ax] / 4.0))
        rp = rng.uniform(-2, 2, 3).tolist() + rng.uniform(-0.02, 0.02,
                                                          3).tolist()
        po = proj_info(dim_y, np.eye(4), tuple(dim_x), mat_x,
                       rigid=affine_matrix_classic(rp), prof_ip=2,
                       prof_tp=0, scl=0.1)
        x = np.asarray(proj_apply("A", gtj, po, "super-resolution"))
        x = x + 75.0 * rng.standard_normal(x.shape).astype(np.float32)
        chans.append([x.astype(np.float32), mat_x])

    sett = Settings(vx=1.0, do_print=0, write_out=False, tolerance=1e-4,
                    sched_num=3, reg_scl=4.0, do_coreg=True,
                    unified_rigid=True, scaling=True)
    t0 = time.time()
    x, y, sett = init(chans, sett)
    t_init = time.time() - t0
    import jax

    jax.block_until_ready(y[0].dat)
    print(f'{{"init_s": {time.time() - t0:.2f}}}')


if __name__ == "__main__":
    main()
