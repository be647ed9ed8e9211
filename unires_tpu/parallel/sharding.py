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


def build_mesh(n_devices: int | None = None, batch: int | None = None):
    """('batch', 'channel') mesh over the available devices."""
    devs = np.asarray(jax.devices())
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


def make_sharded_admm_step(po: ProjOp, method: str, sett, mesh: Mesh) -> Callable:
    """Jitted sharded step for stacked state.

    Signature:
        step(ys, z, w, xdat, M, Minv, scl, tau, lam, rho) -> (ys, z, w, obj)
    with ys (B, C, *dim_y), z/w (B, C, 3, *dim_y), xdat (B, C, *dim_x),
    M/Minv (3, 4) shared, scl/tau/lam (B, C), rho scalar. ys/z/w/xdat sharded
    P('batch', 'channel'); the JTV shrinkage psums over 'channel'.
    """
    A, At, AtA = make_obs_ops(po, method)
    vx_y = tuple(np.sqrt((np.asarray(po.mat_y, np.float64)[:3, :3] ** 2)
                         .sum(0)).astype(np.float32))
    diff = sett.diff
    cg_iter = int(sett.cgs_max_iter)
    cg_tol = float(sett.cgs_tol)
    tiny = 1e-7

    def local(ys, z, w, xdat, M, Minv, scl, tau, lam, rho):
        # per-(subject, channel) y-update, vmapped over the local block
        def y_update(yc, zc, wc, xc, sc, tc, lc):
            rhs = tc * At(xc, M, Minv, sc)
            rhs = rhs - lc * im_divergence(wc - rho * zc, vx_y, diff)

            def lhs(v):
                out = rho * lc * lc * im_divergence(
                    im_gradient(v, vx_y, diff), vx_y, diff)
                return out + tc * AtA(v, M, Minv, sc)

            return cg(lhs, rhs, yc, max_iter=cg_iter, tol=cg_tol)

        upd = jax.vmap(jax.vmap(y_update))
        ys = upd(ys, z, w, xdat, scl, tau, lam)

        # objective (local part; psum'd below)
        def nll_one(yc, xc, sc, tc, lc):
            Ay = A(yc, M, Minv, sc)
            msk = xc != 0
            res = jnp.where(msk, xc - Ay, 0.0)
            return 0.5 * tc * jnp.sum(res * res)

        nll_xy = jnp.sum(jax.vmap(jax.vmap(nll_one))(ys, xdat, scl, tau, lam))

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
    par = P("batch", "channel")
    step = jax.shard_map(
        local, mesh=mesh,
        in_specs=(vol, vol, vol, vol, P(), P(), par, par, par, P()),
        out_specs=(vol, vol, vol, P()),
        check_vma=False,
    )
    return jax.jit(step, donate_argnums=(0, 1, 2))


def shard_state(mesh: Mesh, ys, z, w, xdat):
    """Place stacked state on the mesh with ('batch','channel') sharding."""
    sh = NamedSharding(mesh, P("batch", "channel"))
    return tuple(jax.device_put(a, sh) for a in (ys, z, w, xdat))
