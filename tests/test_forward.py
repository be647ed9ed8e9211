import jax.numpy as jnp
import numpy as np
import pytest

from unires_tpu.geometry import affine_diag, affine_matrix_classic
from unires_tpu.models.forward import check_adjoint, proj_apply
from unires_tpu.models.proj_op import proj_info
from unires_tpu.ops.conv import blur_down, blur_up
from unires_tpu.ops.scaling import apply_scaling, even_slices, odd_slices


def _po(thick=4.0, rot=0.0, gap=0.0, scl=0.0, prof_ip=2, prof_tp=0, dim_y=(24, 26, 28)):
    mat_y = np.eye(4)
    rigid = affine_matrix_classic([0.5, -0.3, 0.2, rot, -rot / 2, rot / 3])
    mat_x = affine_diag([1.0, 1.0, thick])
    dim_x = (24, 26, int(np.ceil(28 / thick)))
    return proj_info(dim_y, mat_y, dim_x, mat_x, rigid=rigid, prof_ip=prof_ip,
                     prof_tp=prof_tp, gap=gap, scl=scl)


def test_proj_info_geometry():
    po = _po(thick=4.0)
    assert po.ratio == (1, 1, 4)
    assert po.dim_thick == 2
    k = po.smo_ker.shape
    # in-plane ratio 1 -> dirac
    assert k[0] == 1 and k[1] == 1 and k[2] > 1
    # VALID strided conv of dim_yx lands exactly on dim_x
    for d in range(3):
        assert (po.dim_yx[d] - k[d]) // po.ratio[d] + 1 == po.dim_x[d]


def test_proj_info_denoising_ratio1():
    po = _po(thick=1.0)
    assert po.ratio == (1, 1, 1)
    assert po.smo_ker.shape == (1, 1, 1)


@pytest.mark.parametrize("method", ["super-resolution", "denoising"])
@pytest.mark.parametrize("cfg", [
    dict(thick=4.0),
    dict(thick=3.0, rot=0.08),
    dict(thick=4.0, gap=0.25),
    dict(thick=4.0, scl=0.1),
    dict(thick=2.0, prof_ip=0, prof_tp=2),
    dict(thick=5.0, rot=-0.05, gap=0.1, scl=-0.07),
])
def test_adjointness(method, cfg):
    po = _po(**cfg)
    diff, scale = check_adjoint(po, method)
    assert abs(diff) < 2e-3 * max(1.0, abs(scale)), (diff, scale)


def test_AtA_equals_At_of_A():
    po = _po(thick=4.0, rot=0.03, scl=0.05)
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.random(po.dim_y, dtype=np.float32))
    AtAy = proj_apply("AtA", y, po, "super-resolution")
    Ay = proj_apply("A", y, po, "super-resolution")
    AtAy2 = proj_apply("At", Ay, po, "super-resolution")
    assert np.allclose(np.asarray(AtAy), np.asarray(AtAy2), atol=1e-4)


def test_A_preserves_constant_interior():
    # kernel sums to 1 -> A of a constant volume is that constant away from edges
    po = _po(thick=4.0)
    y = jnp.ones(po.dim_y, jnp.float32) * 3.0
    Ay = np.asarray(proj_apply("A", y, po, "super-resolution"))
    interior = Ay[4:-4, 4:-4, 2:-2]
    assert np.allclose(interior, 3.0, atol=1e-3)


def test_blur_adjoint():
    rng = np.random.default_rng(1)
    ker = jnp.asarray(rng.random((3, 1, 5), dtype=np.float32))
    x = jnp.asarray(rng.random((18, 7, 21), dtype=np.float32))
    ratio = (1, 1, 4)
    Ax = blur_down(x, ker, ratio)
    y = jnp.asarray(rng.random(Ax.shape, dtype=np.float32))
    Aty = blur_up(y, ker, ratio)
    assert Aty.shape == x.shape
    assert abs(float(jnp.sum(Ax * y)) - float(jnp.sum(Aty * x))) < 1e-3


def test_apply_scaling_roundtrip():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random((6, 7, 8), dtype=np.float32))
    s = jnp.float32(0.13)
    for ax in range(3):
        y = apply_scaling(x, s, ax)
        assert np.allclose(np.asarray(even_slices(y, ax)),
                           np.asarray(even_slices(x, ax)) * np.exp(0.13), atol=1e-5)
        assert np.allclose(np.asarray(odd_slices(y, ax)),
                           np.asarray(odd_slices(x, ax)) * np.exp(-0.13), atol=1e-5)
        back = apply_scaling(y, -s, ax)
        assert np.allclose(np.asarray(back), np.asarray(x), atol=1e-5)


def test_2d_operator_path():
    """2D inputs through proj_info/forward (reference _proj_apply's conv2d
    branches, _project.py:156-157 — unreachable from its CLI but part of the
    documented operator surface): the 2D operator is the degenerate-Z 3D
    chain, exact vs. an explicitly-built (X, Y, 1) 3D operator."""
    import numpy as np

    from unires_tpu.models.forward import check_adjoint, proj_apply
    from unires_tpu.models.proj_op import proj_info

    mat2 = np.eye(3)
    mat2[1, 1] = 4.0  # thick y axis, ratio 4
    po2 = proj_info((64, 64), np.eye(3), (64, 16), mat2,
                    prof_ip=2, prof_tp=0, scl=0.1)
    assert po2.dim_y == (64, 64, 1) and po2.dim_x == (64, 16, 1)
    assert po2.ratio == (1, 4, 1) and po2.dim_thick == 1

    diff, scale = check_adjoint(po2, "super-resolution")
    assert abs(diff) <= 1e-4 * abs(scale)

    mat3 = np.eye(4)
    mat3[1, 1] = 4.0
    po3 = proj_info((64, 64, 1), np.eye(4), (64, 16, 1), mat3,
                    prof_ip=2, prof_tp=0, scl=0.1)
    rng = np.random.default_rng(0)
    y2 = rng.random((64, 64, 1), dtype=np.float32)
    a2 = np.asarray(proj_apply("A", jnp.asarray(y2), po2, "super-resolution"))
    a3 = np.asarray(proj_apply("A", jnp.asarray(y2), po3, "super-resolution"))
    assert np.allclose(a2, a3, atol=1e-6)
