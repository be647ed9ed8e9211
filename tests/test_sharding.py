"""Multi-chip sharded ADMM: 8 virtual CPU devices, vs the unsharded result."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unires_tpu import Settings
from unires_tpu.geometry import affine_diag
from unires_tpu.models.proj_op import proj_info
from unires_tpu.models.forward import proj_apply, obs_dyn_args, make_obs_ops
from unires_tpu.parallel.sharding import (build_mesh, make_sharded_admm_step,
                                          shard_state)
from unires_tpu.ops.finite_diff import im_divergence, im_gradient
from unires_tpu.solvers.cg import cg


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_step_matches_unsharded():
    B, C = 4, 2
    dim_y = (16, 16, 17)
    dim_x = (16, 16, 5)
    po = proj_info(dim_y, np.eye(4), dim_x, affine_diag([1, 1, 4]),
                   prof_ip=2, prof_tp=0)
    sett = Settings(do_print=0, cgs_max_iter=6, cgs_tol=1e-9)
    mesh = build_mesh(8, batch=4)
    assert mesh.shape == {"batch": 4, "channel": 2}

    rng = np.random.default_rng(0)
    gt = rng.random((B, C) + dim_y, dtype=np.float32) * 100
    M, Minv = obs_dyn_args(po, "super-resolution")
    A, At, AtA = make_obs_ops(po, "super-resolution")
    xdat = np.stack([
        [np.asarray(A(jnp.asarray(gt[b, c]), M, Minv, jnp.float32(0.0)))
         for c in range(C)] for b in range(B)])
    ys = jnp.asarray(gt * 0.5)
    z = jnp.zeros((B, C, 3) + dim_y, jnp.float32)
    w = jnp.zeros((B, C, 3) + dim_y, jnp.float32)
    scl = jnp.zeros((B, C), jnp.float32)
    tau = jnp.ones((B, C), jnp.float32) * 0.5
    lam = jnp.ones((B, C), jnp.float32) * 0.1
    rho = jnp.float32(1.3)

    step = make_sharded_admm_step(po, "super-resolution", sett, mesh)
    ys_s, z_s, w_s, xd_s = shard_state(mesh, ys, z, w, jnp.asarray(xdat))
    ys2, z2, w2, obj = step(ys_s, z_s, w_s, xd_s, M, Minv, scl, tau, lam, rho)

    # unsharded reference: same math per (b, c) with a host-side reduce
    vx_y = (1.0, 1.0, 1.0)
    ys_ref = np.zeros_like(gt)
    for b in range(B):
        for c in range(C):
            rhs = 0.5 * At(jnp.asarray(xdat[b, c]), M, Minv, jnp.float32(0.0))
            rhs = rhs - 0.1 * im_divergence(
                w[b, c] - rho * z[b, c], vx_y, "forward")
            lhs = lambda v: (rho * 0.1 * 0.1 * im_divergence(
                im_gradient(v, vx_y, "forward"), vx_y, "forward")
                + 0.5 * AtA(v, M, Minv, jnp.float32(0.0)))
            ys_ref[b, c] = np.asarray(cg(lhs, ys[b, c] * 0 + ys[b, c],
                                         ys[b, c], 6, 1e-9)) * 0
            ys_ref[b, c] = np.asarray(cg(lhs, rhs, ys[b, c], 6, 1e-9))
    assert np.allclose(np.asarray(ys2), ys_ref, atol=2e-2), \
        np.abs(np.asarray(ys2) - ys_ref).max()

    # z-update shrinkage couples channels: verify against direct computation
    Dys = np.stack([[0.1 * np.asarray(im_gradient(jnp.asarray(ys_ref[b, c]),
                                                  vx_y, "forward"))
                     for c in range(C)] for b in range(B)])
    u = np.asarray(w) / float(rho) + Dys
    mag = np.sqrt((u ** 2).sum(axis=(1, 2)))  # reduce C and the 3 grad dims
    shrink = np.maximum(mag - 1.0 / float(rho), 0.0) / (mag + 1e-7)
    z_ref = shrink[:, None, None] * u
    assert np.allclose(np.asarray(z2), z_ref, atol=1e-3), \
        np.abs(np.asarray(z2) - z_ref).max()
    assert np.isfinite(np.asarray(obj)).all()
