"""Multi-chip sharding of the ADMM solver.

The reference is single-device (SURVEY §2.3); the TPU-native scale-out story
for this model family is:

  * **batch** (data parallel): independent subjects — pure DP, no collectives
    in the solve; one all-reduce only if global statistics are wanted.
  * **channel** (tensor-parallel analog): the y-updates of different channels
    are independent given (z, w); the ONLY cross-channel coupling in the
    whole algorithm is the joint-total-variation shrinkage reduce
    sum_c sum_d (w/rho + lam D y)^2  (reference unires/_update.py:171) —
    one psum over the channel axis per outer iteration, riding ICI.
  * spatial sharding (sequence-parallel analog, halo exchange for the
    D/D^T stencil) is the axis to add for volumes that exceed one chip's
    HBM; single-chip volumes don't need it.

This module builds a shard_map'd ADMM step over a ('batch', 'channel') mesh
for geometry-homogeneous problems (all observations share one ProjOp — the
batch-processing regime). State is stacked (B, C, ...) and sharded on the
leading two axes; each shard runs the same jitted per-(subject, channel)
update; the shrinkage magnitude is psum'd over 'channel'.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.forward import make_obs_ops
from ..models.proj_op import ProjOp
from ..ops.finite_diff import im_divergence, im_gradient
from ..solvers.cg import cg


def init_multihost(coordinator_address: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> bool:
    """Flag-guarded ``jax.distributed.initialize`` for multi-host pods.

    The reference has no distributed backend at all (SURVEY §2.3); the
    TPU-native path is the JAX distributed runtime: every host calls this
    once before any device use, after which ``jax.devices()`` spans the pod
    and :func:`build_mesh` lays the BATCH (subject) axis across hosts (DCN
    — subjects are independent, zero cross-subject collectives) and the
    channel axis within a host (its one psum/iteration rides ICI).

    Driven by arguments or the UNIRES_TPU_COORDINATOR /
    UNIRES_TPU_NUM_PROCS / UNIRES_TPU_PROC_ID environment variables; a
    no-op returning False when neither is present (single-host mode).
    Cannot be hardware-tested in this environment (one chip); the
    partitioning it produces is exercised by __graft_entry__.
    dryrun_multichip's simulated 2-host mesh.
    """
    import os

    addr = coordinator_address or os.environ.get("UNIRES_TPU_COORDINATOR")
    if not addr:
        return False
    nproc = num_processes if num_processes is not None else int(
        os.environ.get("UNIRES_TPU_NUM_PROCS", "1"))
    pid = process_id if process_id is not None else int(
        os.environ.get("UNIRES_TPU_PROC_ID", "0"))
    jax.distributed.initialize(coordinator_address=addr,
                               num_processes=nproc, process_id=pid)
    return True


def build_mesh(n_devices: int | None = None, batch: int | None = None,
               devices=None):
    """('batch', 'channel') mesh over the available devices.

    Multi-host: devices are ordered host-major (jax.devices() groups by
    process), so the leading batch axis lands ACROSS hosts — subject
    parallelism over DCN — while the channel axis (the only axis with a
    per-iteration collective) stays within a host on ICI.
    """
    devs = np.asarray(jax.devices() if devices is None else devices)
    n = n_devices or devs.size
    devs = devs[:n]
    if batch is None:
        # widest 2-factorisation with channel as the minor axis
        chan = 1
        for c in (4, 3, 2):
            if n % c == 0:
                chan = c
                break
        batch = n // chan
    else:
        chan = n // batch
    return Mesh(devs.reshape(batch, chan), ("batch", "channel"))


def make_sharded_admm_step(po: ProjOp | list, method: str, sett,
                           mesh: Mesh) -> Callable:
    """Jitted sharded step for stacked state — the PRODUCTION solver
    (DCT-preconditioned, residual-stopped CG — identical math to
    solvers.admm.make_admm_body), sharded over ('batch', 'channel').

    ``po``: one ProjOp, or a list over repeats (homogeneous across
    channels/subjects — the batch-processing regime).

    Signature:
        step(ys, z, w, xdat, M, Minv, scl, tau, lam, rho) -> (ys, z, w, obj)
    with ys (B, C, *dim_y), z/w (B, C, 3, *dim_y); per-repeat leading axes on
    the observation operands: xdat (R, B, C, *dim_x), M/Minv (R, 3, 4)
    shared, scl/tau (R, B, C), lam (B, C), rho scalar. ys/z/w/xdat sharded
    P('batch', 'channel'); the JTV shrinkage psums over 'channel'.
    """
    pos = po if isinstance(po, (list, tuple)) else [po]
    R_n = len(pos)
    ops = [make_obs_ops(p, method) for p in pos]
    vx_y = tuple(np.sqrt((np.asarray(pos[0].mat_y, np.float64)[:3, :3] ** 2)
                         .sum(0)).astype(np.float32))
    dim_y = tuple(int(d) for d in pos[0].dim_y)
    diff = sett.diff
    cg_iter = int(sett.cgs_max_iter)
    cg_tol = float(sett.cgs_tol)
    tiny = 1e-7

    from ..solvers.admm import dct_matrices, dct_membrane_eigs

    Cx, Cy, Cz = dct_matrices(dim_y)
    lamD_dct = dct_membrane_eigs(dim_y, vx_y)
    hiprec = jax.lax.Precision.HIGHEST
    ones_y = jnp.ones(dim_y, jnp.float32)

    def local(ys, z, w, xdat, M, Minv, scl, tau, lam, rho):
        # per-(subject, channel) y-update, vmapped over the local block
        def y_update(yc, zc, wc, xc, sc, tc, lc):
            rhs = jnp.zeros_like(yc)
            cdiag = jnp.float32(0.0)
            for n in range(R_n):
                A, At, AtA = ops[n]
                rhs = rhs + tc[n] * At(xc[n], M[n], Minv[n], sc[n])
                cdiag = cdiag + tc[n] * jnp.mean(
                    AtA(ones_y, M[n], Minv[n], sc[n]))
            rhs = rhs - lc * im_divergence(wc - rho * zc, vx_y, diff)

            def lhs(v):
                out = rho * lc * lc * im_divergence(
                    im_gradient(v, vx_y, diff), vx_y, diff)
                for n in range(R_n):
                    A, At, AtA = ops[n]
                    out = out + tc[n] * AtA(v, M[n], Minv[n], sc[n])
                return out

            # diagonal-in-DCT-basis preconditioner (solvers.admm
            # dct_matrices: XLA's non-power-of-2 TPU FFT compiles to tens of
            # MB of code; the DCT is six MXU matmuls)
            denom = cdiag + rho * lc * lc * lamD_dct

            def precond(v):
                t = jnp.einsum("ai,ijk->ajk", Cx, v, precision=hiprec)
                t = jnp.einsum("bj,ajk->abk", Cy, t, precision=hiprec)
                t = jnp.einsum("ck,abk->abc", Cz, t, precision=hiprec)
                t = t / denom
                t = jnp.einsum("ai,abc->ibc", Cx, t, precision=hiprec)
                t = jnp.einsum("bj,ibc->ijc", Cy, t, precision=hiprec)
                t = jnp.einsum("ck,ijc->ijk", Cz, t, precision=hiprec)
                return t

            return cg(lhs, rhs, yc, max_iter=cg_iter, tol=3.0 * cg_tol,
                      precond=precond, stop="residual")

        # observation operands carry a leading repeat axis: map over their
        # axis 1 (B) then axis 1-after-B (C), keeping R as y_update's axis 0
        upd = jax.vmap(jax.vmap(y_update, in_axes=(0, 0, 0, 1, 1, 1, 0)),
                       in_axes=(0, 0, 0, 1, 1, 1, 0))
        ys = upd(ys, z, w, xdat, scl, tau, lam)

        # objective (local part; psum'd below)
        def nll_one(yc, xc, sc, tc, lc):
            acc = jnp.float32(0.0)
            for n in range(R_n):
                A, At, AtA = ops[n]
                Ay = A(yc, M[n], Minv[n], sc[n])
                msk = xc[n] != 0
                res = jnp.where(msk, xc[n] - Ay, 0.0)
                acc = acc + 0.5 * tc[n] * jnp.sum(res * res)
            return acc

        nll_xy = jnp.sum(jax.vmap(jax.vmap(
            nll_one, in_axes=(0, 1, 1, 1, 0)),
            in_axes=(0, 1, 1, 1, 0))(ys, xdat, scl, tau, lam))

        # gradients and the cross-channel JTV reduce (ONE psum over 'channel')
        Dys = jax.vmap(jax.vmap(
            lambda yc, lc: lc * im_gradient(yc, vx_y, diff)))(ys, lam)
        u = w / rho + Dys
        mag2_local = jnp.sum(u * u, axis=(1, 2))  # (B_loc, *dim_y)
        mag2 = jax.lax.psum(mag2_local, "channel")
        mag = jnp.sqrt(mag2)
        shrink = jnp.maximum(mag - 1.0 / rho, 0.0) / (mag + tiny)
        z = shrink[:, None, None] * u
        w = w + rho * (Dys - z)

        nll_y_local = jnp.sum(
            jnp.sqrt(jax.lax.psum(jnp.sum(Dys * Dys, axis=(1, 2)), "channel")))
        # nll_y identical on every channel shard after the psum: divide by
        # the channel count when psum-reducing the total below
        nll_xy = jax.lax.psum(nll_xy, ("batch", "channel"))
        nll_y = jax.lax.psum(nll_y_local, "batch")
        nll_y = jax.lax.psum(nll_y, "channel") / mesh.shape["channel"]
        obj = jnp.stack([nll_xy + nll_y, nll_xy, nll_y])
        return ys, z, w, obj

    vol = P("batch", "channel")
    obs = P(None, "batch", "channel")  # leading repeat axis replicated
    step = jax.shard_map(
        local, mesh=mesh,
        in_specs=(vol, vol, vol, obs, P(), P(), obs, obs, vol, P()),
        out_specs=(vol, vol, vol, P()),
        check_vma=False,
    )

    def wrapped(ys, z, w, xdat, M, Minv, scl, tau, lam, rho):
        # accept single-repeat operands without the leading repeat axis
        if xdat.ndim == ys.ndim:
            xdat = xdat[None]
        if M.ndim == 2:
            M, Minv = M[None], Minv[None]
        if scl.ndim == 2:
            scl, tau = scl[None], tau[None]
        return step(ys, z, w, xdat, M, Minv, scl, tau, lam, rho)

    return jax.jit(wrapped, donate_argnums=(0, 1, 2))


def shard_state(mesh: Mesh, ys, z, w, xdat):
    """Place stacked state on the mesh with ('batch','channel') sharding.

    ``xdat`` may carry a leading (replicated) repeat axis: (R, B, C, *dim_x).
    """
    sh = NamedSharding(mesh, P("batch", "channel"))
    sh_obs = NamedSharding(mesh, P(None, "batch", "channel"))
    xsh = sh_obs if xdat.ndim == ys.ndim + 1 else sh
    return (jax.device_put(ys, sh), jax.device_put(z, sh),
            jax.device_put(w, sh), jax.device_put(xdat, xsh))
