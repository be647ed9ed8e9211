"""Full-scale fit-chunk hardware regression (~3-5 min on a warm cache).

Fills the hole between the kernel smoke (scripts/tpu_kernel_smoke.py:
standalone 40x44x140 calls) and the 10-minute bench: the round-3 bench died
with a TPU worker crash INSIDE the full-scale scanned fit chunk
(181x217x181, K iterations of ADMM + rigid GN + scaling GN + batched DCT
preconditioner), a surface no smaller test exercised.

Runs the bench's exact 3-channel workload geometry (BASELINE.md row 4:
thick axis rotated per channel, rigid misalignment, even/odd scaling) but
only TWO chunks of K=3 iterations, no coreg, no output writing.  Asserts:

  * the chunk executes and its results materialise on host (no worker crash)
  * the objective is finite and strictly decreasing across iterations
  * a second process-level call path (AOT-warm) is covered by re-invoking
    this script: first run stores the executable, second run loads it.

Exit 0 + "FIT REGRESSION OK" on success; nonzero with the failing stage
otherwise.  Knobs for bisecting hardware faults (all honoured by the
library): UNIRES_TPU_NO_AOT_CACHE=1, UNIRES_TPU_SHEAR=0,
UNIRES_TPU_WINDOW_ROLLED=1, UNIRES_TPU_BACKEND=xla.

Wired into .claude/skills/verify/SKILL.md — run after any kernel or solver
change BEFORE the full bench.
"""
import json
import os
import sys
import time

import numpy as np


def main():
    t_start = time.time()
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from tests.phantoms import blob_phantom
    from unires_tpu import Settings, init
    from unires_tpu.geometry import affine_matrix_classic, affine_diag
    from unires_tpu.models.forward import proj_apply
    from unires_tpu.models.proj_op import proj_info
    from unires_tpu.pipeline.fit import fit as fit_solver

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)

    K = int(os.environ.get("REG_CHUNK_ITERS", "3"))
    max_iter = int(os.environ.get("REG_MAX_ITER", str(2 * K)))
    do_coreg = os.environ.get("REG_COREG", "0") not in ("0", "")

    dim_y = (181, 217, 181)
    rng = np.random.default_rng(0)
    gt = blob_phantom(dim=dim_y, n_blobs=24, amplitude=2000.0, seed=0)
    gtj = jnp.asarray(gt)
    np.asarray(jnp.ones(8) + 1)  # warm the transfer path

    chans = []
    thick_axes = [2, 1, 0]
    for c in range(3):
        ax = thick_axes[c]
        vx = [1.0, 1.0, 1.0]
        vx[ax] = 4.0
        mat_x = affine_diag(vx)
        dim_x = list(dim_y)
        dim_x[ax] = int(np.ceil(dim_y[ax] / 4.0))
        rp = rng.uniform(-2, 2, 3).tolist() + rng.uniform(-0.02, 0.02, 3).tolist()
        rigid = affine_matrix_classic(rp)
        po = proj_info(dim_y, np.eye(4), tuple(dim_x), mat_x, rigid=rigid,
                       prof_ip=2, prof_tp=0, scl=0.1)
        x = np.asarray(proj_apply("A", gtj, po, "super-resolution"))
        x = x + 75.0 * rng.standard_normal(x.shape).astype(np.float32)
        chans.append([x.astype(np.float32), mat_x])
    print(f"[{time.time() - t_start:.0f}s] workload built", flush=True)

    # coreg off by default: the crash surface is the fit chunk, and skipping
    # coreg saves ~1 min; rigid GN still runs (unified_rigid) on the residual
    # misalignment the degradation protocol injected above.  REG_COREG=1
    # enables it (the bench path: coreg rotations fold into mat_yx and widen
    # every window plan — the round-3 crash configuration).
    sett = Settings(vx=1.0, do_print=1, write_out=False, tolerance=0.0,
                    sched_num=3, reg_scl=4.0, do_coreg=do_coreg,
                    unified_rigid=True, scaling=True,
                    max_iter=max_iter, chunk_iters=K,
                    profile_dir=os.environ.get("REG_PROFILE_DIR") or None)
    x, y, sett = init(chans, sett)
    print(f"[{time.time() - t_start:.0f}s] init done", flush=True)

    t0 = time.time()
    y, R, jtv, obj, n_iter = fit_solver(x, y, sett)
    t_fit = time.time() - t0
    print(f"[{time.time() - t_start:.0f}s] fit ran {n_iter} iters "
          f"in {t_fit:.1f}s", flush=True)

    obj = np.asarray(obj, np.float64)
    ok = True
    if n_iter < max_iter:
        print(f"FAIL: expected {max_iter} iterations, got {n_iter}")
        ok = False
    if not np.all(np.isfinite(obj)):
        print(f"FAIL: non-finite objective: {obj[:, 0]}")
        ok = False
    elif obj.shape[0] >= 2 and not float(obj[-1, 0]) < float(obj[0, 0]):
        # per-iteration wobble right after a rigid/scaling update is normal
        # ADMM behaviour; the trace must still trend DOWN overall
        print(f"FAIL: objective did not decrease: {obj[:, 0]}")
        ok = False
    rec = np.asarray(y[0].dat)
    if not np.all(np.isfinite(rec)):
        print("FAIL: non-finite reconstruction")
        ok = False

    print(json.dumps({"n_iter": int(n_iter), "fit_s": round(t_fit, 1),
                      "sec_per_iter": round(t_fit / max(n_iter, 1), 2),
                      "obj0": float(obj[0, 0]) if obj.size else None,
                      "objN": float(obj[-1, 0]) if obj.size else None}),
          flush=True)
    if not ok:
        print("FIT REGRESSION FAILED", flush=True)
        sys.exit(1)
    print("FIT REGRESSION OK", flush=True)


if __name__ == "__main__":
    main()
