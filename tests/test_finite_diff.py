import jax.numpy as jnp
import numpy as np
import pytest

from unires_tpu.ops.finite_diff import im_gradient, im_divergence, DtD


VX = [(1.0, 1.0, 1.0), (1.0, 1.3, 4.0)]


@pytest.mark.parametrize("which", ["forward", "backward", "central"])
@pytest.mark.parametrize("vx", VX)
def test_divergence_is_exact_adjoint(which, vx):
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.random((9, 10, 11), dtype=np.float32))
    p = jnp.asarray(rng.random((3, 9, 10, 11), dtype=np.float32))
    Du = im_gradient(u, vx, which)
    Dtp = im_divergence(p, vx, which)
    lhs = float(jnp.sum(Du * p))
    rhs = float(jnp.sum(Dtp * u))
    assert abs(lhs - rhs) < 1e-4 * max(1.0, abs(lhs))


def test_forward_diff_values():
    u = jnp.asarray(np.arange(4, dtype=np.float32)).reshape(4, 1, 1) * jnp.ones((4, 3, 3), jnp.float32)
    g = im_gradient(u, (1.0, 1.0, 1.0), "forward")
    # interior forward diff = 1; last voxel -> (0 - u)/1 (zero Dirichlet)
    assert np.allclose(np.asarray(g[0][:3]), 1.0)
    assert np.allclose(np.asarray(g[0][3]), -3.0)
    # constant along y/z in the interior; last index hits the zero bound
    assert np.allclose(np.asarray(g[1][:, :2, :]), 0.0)
    assert np.allclose(np.asarray(g[2][:, :, :2]), 0.0)


@pytest.mark.parametrize("which", ["forward", "backward"])
def test_DtD_positive_semidefinite(which):
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.standard_normal((8, 9, 10)).astype(np.float32))
    quad = float(jnp.sum(u * DtD(u, (1.0, 2.0, 0.7), which)))
    assert quad >= -1e-4


def test_voxel_scaling():
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.random((6, 6, 6), dtype=np.float32))
    g1 = im_gradient(u, (1.0, 1.0, 1.0), "forward")
    g2 = im_gradient(u, (2.0, 2.0, 2.0), "forward")
    assert np.allclose(np.asarray(g1), 2 * np.asarray(g2), atol=1e-6)
