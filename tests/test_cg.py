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
