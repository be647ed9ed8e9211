import numpy as np
import pytest

from unires_tpu.geometry import affine_matrix_classic
from unires_tpu.pipeline.nifti import load, save


def test_roundtrip_plain(tmp_path):
    rng = np.random.default_rng(0)
    dat = rng.random((17, 19, 23)).astype(np.float32) * 100
    mat = affine_matrix_classic([3.0, -2.0, 7.0, 0.1, 0.0, -0.05])
    p = str(tmp_path / "vol.nii")
    save(dat, p, affine=mat)
    got, hdr = load(p)
    assert got.shape == dat.shape
    assert np.allclose(got, dat, atol=1e-4)
    assert np.allclose(hdr.affine, mat, atol=1e-5)


def test_roundtrip_gzip(tmp_path):
    dat = np.arange(4 * 5 * 6, dtype=np.float32).reshape(4, 5, 6)
    p = str(tmp_path / "vol.nii.gz")
    save(dat, p, affine=np.eye(4))
    got, hdr = load(p)
    assert np.allclose(got, dat)


def test_roundtrip_4d(tmp_path):
    dat = np.random.default_rng(1).random((8, 9, 10, 3)).astype(np.float32)
    p = str(tmp_path / "vol4d.nii.gz")
    save(dat, p, affine=np.eye(4))
    got, hdr = load(p)
    assert got.shape == dat.shape
    assert np.allclose(got, dat, atol=1e-6)


def test_int16_with_scaling(tmp_path):
    # write int16 with slope/inter by hand-editing header semantics
    dat = (np.random.default_rng(2).random((6, 7, 8)) * 1000).astype(np.int16)
    p = str(tmp_path / "vol_i16.nii")
    save(dat, p, affine=np.eye(4), dtype=np.int16)
    got, hdr = load(p)
    assert np.allclose(got, dat.astype(np.float32))


def test_fortran_order_on_disk(tmp_path):
    # voxel (1,0,0) must be the second element on disk (NIfTI is Fortran)
    dat = np.zeros((3, 3, 3), np.float32)
    dat[1, 0, 0] = 7.0
    p = str(tmp_path / "f.nii")
    save(dat, p, affine=np.eye(4))
    raw = open(p, "rb").read()
    vals = np.frombuffer(raw[352:], np.float32)
    assert vals[1] == 7.0


def test_bad_file_raises(tmp_path):
    p = str(tmp_path / "junk.nii")
    open(p, "wb").write(b"\x00" * 400)
    with pytest.raises(ValueError):
        load(p)
