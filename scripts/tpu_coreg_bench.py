"""Micro-profile the NMI coreg optimiser per pyramid level (round-5 init
work): wall-clock vs iteration budget at each level's shapes, to locate
where the ~22 s warm coreg goes and validate iteration-budget cuts.

Usage: python -u scripts/tpu_coreg_bench.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from tests.phantoms import brain_phantom
    from unires_tpu.pipeline.registration import (_iso_pyramid,
                                                  _fix_centre,
                                                  _opt_level_batch,
                                                  _shear_plan_level)

    dim = (181, 217, 181)
    fix = jnp.asarray(brain_phantom(dim=dim, contrast="t1", seed=0))
    movs = [jnp.asarray(brain_phantom(dim=dim, contrast=c, seed=0))
            for c in ("t2", "pd")]
    np.asarray(jnp.ones(4) + 1)

    levels = (8.0, 4.0, 2.0, 1.0)
    fwhms = (7.0, 7.0, 4.0, 4.0)
    mat = np.eye(4)
    wc = _fix_centre(fix.shape, mat)
    fpyr = _iso_pyramid(fix, mat, levels, fwhms)
    mpyrs = [_iso_pyramid(m, mat, levels, fwhms) for m in movs]

    for li in range(len(levels)):
        fd, fm = fpyr[li]
        mds = jnp.stack([p[li][0] for p in mpyrs])
        mm = mpyrs[0][li][1]
        qs = np.zeros((2, 6))
        plan = (None if li == 0 else
                _shear_plan_level(fd.shape, mds.shape[1:], mm, fm,
                                  qs[0], wc, "SE"))
        for iters in (150, 60, 30):
            t0 = time.time()
            qj, loss = _opt_level_batch(fd, fm, mds, mm, qs, wc, "SE",
                                        64, iters, plan)
            jax.block_until_ready(qj)
            dt = time.time() - t0
            # run again warm (first call may compile)
            t0 = time.time()
            qj, loss = _opt_level_batch(fd, fm, mds, mm, qs, wc, "SE",
                                        64, iters, plan)
            jax.block_until_ready(qj)
            dt2 = time.time() - t0
            print(f"level {levels[li]:.0f}mm dim={tuple(fd.shape)} "
                  f"iters<={iters}: first {dt:.2f}s warm {dt2:.2f}s "
                  f"loss={np.asarray(loss)}", flush=True)


if __name__ == "__main__":
    main()
