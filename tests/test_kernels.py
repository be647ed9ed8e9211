import numpy as np

from unires_tpu.kernels import kernel_1d, smooth_kernel


def test_dirac():
    assert np.array_equal(kernel_1d(-1, 4.0), [1.0])
    assert np.array_equal(kernel_1d(2, 0.0), [1.0])


def test_rect_sum_and_symmetry():
    for w in (1.0, 2.0, 3.0, 4.0, 7.5):
        k = kernel_1d(0, w)
        assert abs(k.sum() - 1.0) < 1e-12
        assert k.size % 2 == 1
        assert np.allclose(k, k[::-1])


def test_rect_width4_matches_analytic():
    # boxcar of width 4 integrated over unit voxels: [.5, 1, 1, 1, .5]/4
    k = kernel_1d(0, 4.0)
    assert np.allclose(k, np.array([0.5, 1, 1, 1, 0.5]) / 4.0)


def test_tri_gauss_normalised():
    for p in (1, 2):
        for w in (1.0, 2.5, 4.0):
            k = kernel_1d(p, w)
            assert abs(k.sum() - 1.0) < 1e-9
            assert np.allclose(k, k[::-1])
            assert k.argmax() == k.size // 2


def test_smooth_kernel_outer_product():
    k = smooth_kernel([2, 2, 0], [1.0, 1.0, 4.0])
    assert k.ndim == 3
    assert abs(k.sum() - 1.0) < 1e-5
    # thick axis (rect fwhm 4) has 5 taps
    assert k.shape[2] == 5


def test_ratio1_dirac_inplane():
    # in-plane axes with ratio 1 -> dirac: kernel size 1 on those axes
    k = smooth_kernel([-1, -1, 0], [1.0, 1.0, 4.0])
    assert k.shape[0] == 1 and k.shape[1] == 1 and k.shape[2] == 5
