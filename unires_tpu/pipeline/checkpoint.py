"""Checkpoint / resume for the ADMM solver.

The reference is one-shot (SURVEY §5: intermediate state lives only in RAM
and is lost on failure; the restartable unit is the whole preproc call). Here
the full solver state is a small, explicit pytree — {y, z, w, rigid_q, scl,
schedule position, rho, iteration, objective trace, countdowns} — serialized
with numpy every ``sett.checkpoint_every`` outer iterations, so a run resumes
mid-solve after preemption.
"""
from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np


def save_checkpoint(path: str, x, y, z, w, state: dict) -> str:
    """Write solver state. ``state`` carries the host-side loop scalars."""
    payload = dict(
        ys=np.stack([np.asarray(yc.dat) for yc in y]),
        z=np.asarray(z),
        w=np.asarray(w),
        lams=np.asarray([yc.lam for yc in y], np.float64),
        lam0s=np.asarray([yc.lam0 for yc in y], np.float64),
        rigid_q=np.stack([np.asarray(o.rigid_q, np.float64)
                          if o.rigid_q is not None else np.zeros(6)
                          for xc in x for o in xc]),
        scls=np.asarray([o.po.scl for xc in x for o in xc], np.float64),
        obj_trace=np.asarray(state.get("obj_trace", np.zeros((0, 3)))),
    )
    for k in ("rho", "cnt_scl", "cnt_scl_iter", "n_iter", "countdown0",
              "countdown1"):
        payload[k] = np.asarray(state[k])
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(tmp, **payload)
    os.replace(tmp + ".npz" if os.path.exists(tmp + ".npz") else tmp, path)
    return path


def load_checkpoint(path: str) -> dict:
    with np.load(path, allow_pickle=False) as f:
        return {k: f[k] for k in f.files}


def restore_into(ckpt: dict, x, y):
    """Apply a checkpoint onto freshly-initialised (x, y) structs.

    Returns (z, w, state-dict) for the fit loop.
    """
    C = len(y)
    ys = ckpt["ys"]
    assert ys.shape[0] == C, "checkpoint/problem channel mismatch"
    for c in range(C):
        y[c].dat = jnp.asarray(ys[c])
        y[c].lam = float(ckpt["lams"][c])
        y[c].lam0 = float(ckpt["lam0s"][c])
    i = 0
    for xc in x:
        for o in xc:
            o.rigid_q = np.asarray(ckpt["rigid_q"][i], np.float64)
            o.po.scl = float(ckpt["scls"][i])
            from ..geometry import affine_basis, fov_centre, rigid_from_q

            o.po.rigid = rigid_from_q(
                o.rigid_q, affine_basis("SE"),
                fov_centre(y[0].mat, y[0].dim))
            i += 1
    state = dict(
        rho=float(ckpt["rho"]),
        cnt_scl=int(ckpt["cnt_scl"]),
        cnt_scl_iter=int(ckpt["cnt_scl_iter"]),
        n_iter=int(ckpt["n_iter"]),
        countdown0=int(ckpt["countdown0"]),
        countdown1=int(ckpt["countdown1"]),
        obj_trace=[row for row in np.asarray(ckpt["obj_trace"], np.float64)],
    )
    return jnp.asarray(ckpt["z"]), jnp.asarray(ckpt["w"]), state
