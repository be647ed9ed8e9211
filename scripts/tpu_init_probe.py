"""Warm-init breakdown probe: the bench workload's init() only, with
UNIRES_TPU_TIMING stage/phase prints (run twice: first run recompiles any
AOT entries invalidated by source edits, second run is the warm number)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("UNIRES_TPU_TIMING", "1")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "tests")
    from phantoms import brain_phantom

    from unires_tpu import Settings, init
    from unires_tpu.geometry import (affine_basis, affine_diag,
                                     affine_matrix_classic, expm, rigid_log)
    from unires_tpu.models.forward import proj_apply
    from unires_tpu.models.proj_op import proj_info

    dim_y = (181, 217, 181)
    rng = np.random.default_rng(0)
    gts = [brain_phantom(dim=dim_y, contrast=c, amplitude=2000.0, seed=0)
           for c in ("t1", "t2", "pd")]
    import time as _t
    _t0=_t.time()
    np.asarray(jnp.ones(8) + 1)
    print(f"[probe] tunnel warm {_t.time()-_t0:.1f}s", flush=True)

    basis_se = affine_basis("SE")
    rps = [rng.uniform(-2, 2, 3).tolist()
           + rng.uniform(-0.02, 0.02, 3).tolist() for _ in range(3)]
    logs = [rigid_log(affine_matrix_classic(rp), basis_se) for rp in rps]
    qm = np.mean(logs, axis=0)
    rigids = [expm(lg - qm, basis_se) for lg in logs]

    chans = []
    thick_axes = [2, 1, 0]
    for c in range(3):
        ax = thick_axes[c]
        vx = [1.0, 1.0, 1.0]
        vx[ax] = 4.0
        mat_x = affine_diag(vx)
        dim_x = list(dim_y)
        dim_x[ax] = int(np.ceil(dim_y[ax] / 4.0))
        po = proj_info(dim_y, np.eye(4), tuple(dim_x), mat_x,
                       rigid=rigids[c], prof_ip=2, prof_tp=0, scl=0.1)
        _t0=_t.time()
        x = np.asarray(proj_apply("A", jnp.asarray(gts[c]), po,
                                  "super-resolution"))
        print(f"[probe] degrade ch{c} {_t.time()-_t0:.1f}s", flush=True)
        x = x + 75.0 * rng.standard_normal(x.shape).astype(np.float32)
        chans.append([x.astype(np.float32), mat_x])

    sett = Settings(vx=1.0, do_print=0, write_out=False, tolerance=1e-4,
                    sched_num=3, reg_scl=4.0, do_coreg=True,
                    unified_rigid=True, scaling=True)
    t0 = time.time()
    x, y, sett = init(chans, sett)
    jax.block_until_ready(y[0].dat)
    print(f"INIT_TOTAL {time.time() - t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
