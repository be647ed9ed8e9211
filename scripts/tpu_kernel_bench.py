"""Per-kernel microbenchmark at the production bench geometry (real TPU).

Times the shear pull/push/pull_grad Pallas kernels (and the polyphase blur)
at the exact shapes the 3-channel headline bench uses, printing ms and
achieved HBM bandwidth per kernel plus the window/cover sizes of the active
plans.  Inputs vary per repetition (the axon terminal result-caches
identical executions).

Knobs: UNIRES_TPU_SHEAR / UNIRES_TPU_WINDOW_ROLLED env vars select kernel
variants; pass --geometry ch0|ch1|ch2 to pick the thick axis.
"""
import argparse
import os
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--geometry", default="ch0", choices=["ch0", "ch1", "ch2"])
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--pose_budget", type=float, default=0.02,
                    help="per-plan rigid drift allowance (radians); "
                    "Settings.pose_budget default is 0.02")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from unires_tpu.geometry import affine_matrix_classic, affine_diag
    from unires_tpu.models.forward import make_obs_suite, obs_dyn_args
    from unires_tpu.models.proj_op import proj_info
    from unires_tpu.ops.conv import blur_down_sep, blur_up_sep

    dim_y = (181, 217, 181)
    ax = {"ch0": 2, "ch1": 1, "ch2": 0}[args.geometry]
    vx = [1.0, 1.0, 1.0]
    vx[ax] = 4.0
    dim_x = list(dim_y)
    dim_x[ax] = int(np.ceil(dim_y[ax] / 4.0))
    rng = np.random.default_rng(0)
    rp = rng.uniform(-2, 2, 3).tolist() + rng.uniform(-0.02, 0.02, 3).tolist()
    po = proj_info(dim_y, np.eye(4), tuple(dim_x), affine_diag(vx),
                   rigid=affine_matrix_classic(rp), prof_ip=2, prof_tp=0,
                   scl=0.1)
    suite = make_obs_suite(po, "super-resolution",
                           pose_budget=args.pose_budget)
    M, Minv = obs_dyn_args(po, "super-resolution")
    for name, plan in zip(("pull/splan", "push/psplan", "pull/fplan",
                           "push/pplan"), suite["plans"]):
        if plan is not None:
            tile, cover, pad, win = plan[:4]
            print(f"plan {name}: tile={tile} cover={cover} win={win} "
                  f"pad={pad}" + (f" lo={plan[4]}" if len(plan) > 4 else ""))

    vol_y = jnp.asarray(rng.random(dim_y, dtype=np.float32))
    vol_yx = suite["pull"](vol_y, M)
    kers, ratio = po.smo_ker_1d, po.ratio
    # the axon result cache persists ACROSS processes — a fixed seed would
    # make every rep of a re-run a cache hit; salt inputs per process.
    salt = jnp.float32(1e-6 * (os.getpid() % 9973 + 1))

    def timeit(name, fn, out_elems, in_elems):
        ts = []
        for i in range(args.reps):
            v = vol_y + salt * jnp.float32(i + 1)
            t0 = time.perf_counter()
            jax.block_until_ready(fn(v))
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        gb = 4.0 * (float(in_elems) + float(out_elems)) / 1e9
        print(f"{name:22s} {dt * 1e3:8.2f} ms   {gb / dt:6.1f} GB/s")
        return dt

    n_y, n_yx = np.prod(dim_y), np.prod(po.dim_yx)
    t_pull = timeit("pull", lambda v: suite["pull"](v, M), n_yx, n_y)
    t_push = timeit("push",
                    lambda v: suite["push"](vol_yx + 1e-6 * jnp.mean(v),
                                            M, Minv), n_y, n_yx)
    t_grad = timeit("pull_grad", lambda v: suite["pull_grad"](v, M),
                    3 * n_yx, n_y)
    t_bd = timeit("blur_down",
                  lambda v: blur_down_sep(suite["pull"](v, M), kers, ratio),
                  np.prod(po.dim_x), n_y) - t_pull
    t_ata = timeit("AtA (full chain)",
                   lambda v: suite["AtA"](v, M, Minv, jnp.float32(0.1)),
                   n_y, n_y)
    print(f"blur_down alone ~{t_bd * 1e3:.2f} ms; "
          f"AtA = {t_ata * 1e3:.2f} ms vs pull+push+2blur ~"
          f"{(t_pull + t_push + 2 * max(t_bd, 0)) * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
