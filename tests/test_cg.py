import jax.numpy as jnp
import numpy as np

from unires_tpu.solvers.cg import cg


def test_cg_solves_spd_system():
    rng = np.random.default_rng(0)
    n = 64
    Q = rng.standard_normal((n, n))
    A = Q @ Q.T + n * np.eye(n)
    b = rng.standard_normal(n)
    Aj = jnp.asarray(A, jnp.float32)
    bj = jnp.asarray(b, jnp.float32)
    x = cg(lambda v: Aj @ v, bj, jnp.zeros(n, jnp.float32), max_iter=200, tol=1e-12)
    want = np.linalg.solve(A, b)
    assert np.allclose(np.asarray(x), want, atol=1e-3)


def test_cg_volume_operator():
    # smooth SPD operator on a volume: v + DtD v
    from unires_tpu.ops.finite_diff import DtD

    rng = np.random.default_rng(1)
    u_true = jnp.asarray(rng.random((12, 13, 14), dtype=np.float32))
    vx = (1.0, 1.0, 2.0)
    Aop = lambda v: v + DtD(v, vx)
    b = Aop(u_true)
    u = cg(Aop, b, jnp.zeros_like(b), max_iter=300, tol=1e-12)
    assert np.allclose(np.asarray(u), np.asarray(u_true), atol=1e-3)


def test_cg_early_stop_respects_max_iter():
    # with tol=1 it should stop after ~2 iterations and still be finite
    rng = np.random.default_rng(2)
    A = np.eye(8) * 2.0
    b = rng.standard_normal(8)
    x = cg(lambda v: jnp.asarray(A, jnp.float32) @ v, jnp.asarray(b, jnp.float32),
           jnp.zeros(8, jnp.float32), max_iter=20, tol=1.0)
    assert np.isfinite(np.asarray(x)).all()


def test_cg_batched_matches_per_channel_residual_stop():
    """Each batch entry of cg_batched must follow the trajectory the
    per-channel residual-stop cg gives it alone (converged entries frozen)."""
    from unires_tpu.solvers.cg import cg, cg_batched

    rng = np.random.default_rng(0)
    C, n = 3, 50
    # SPD systems with different conditioning per channel
    mats, bs, x0s = [], [], []
    for c in range(C):
        Q = rng.standard_normal((n, n))
        A = Q @ Q.T + (1.0 + 5.0 * c) * np.eye(n)
        mats.append(jnp.asarray(A.astype(np.float32)))
        bs.append(rng.standard_normal(n).astype(np.float32))
        x0s.append(rng.standard_normal(n).astype(np.float32))
    b = jnp.asarray(np.stack(bs))
    x0 = jnp.asarray(np.stack(x0s))
    d = jnp.stack([jnp.diagonal(m) for m in mats])

    def A_all(V):
        return jnp.stack([mats[c] @ V[c] for c in range(C)])

    def P_all(V):
        return V / d

    got = cg_batched(A_all, b, x0, max_iter=30, tol=1e-3, precond=P_all)
    for c in range(C):
        want = cg(lambda v, c=c: mats[c] @ v, b[c], x0[c], max_iter=30,
                  tol=1e-3, precond=lambda v, c=c: v / d[c], stop="residual")
        np.testing.assert_allclose(np.asarray(got[c]), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)
