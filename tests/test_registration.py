"""NMI rigid registration tests: recover known misalignments."""
import jax.numpy as jnp
import numpy as np

from phantoms import blob_phantom

from unires_tpu.geometry import affine_matrix_classic, voxel_size
from unires_tpu.pipeline.registration import (affine_align, reset_origin,
                                              atlas_align)


def test_affine_align_recovers_translation_and_rotation():
    gt = blob_phantom(dim=(48, 48, 48), amplitude=1000.0, seed=3)
    rng = np.random.default_rng(0)
    fix_dat = gt + 20.0 * rng.standard_normal(gt.shape).astype(np.float32)
    # moving: same anatomy with DIFFERENT contrast (nonlinear intensity map)
    mov_anat = 1500.0 * np.sqrt(gt / 1000.0)
    mov_dat = mov_anat.astype(np.float32) + 20.0 * rng.standard_normal(gt.shape).astype(np.float32)
    # true misalignment applied to the moving image's affine
    R_true = affine_matrix_classic([3.0, -2.0, 1.5, 0.05, -0.03, 0.04])
    fix_mat = np.eye(4)
    mov_mat = R_true @ np.eye(4)  # moving world = R_true * anatomical world
    mat_a = affine_align(
        [(jnp.asarray(fix_dat), fix_mat), (jnp.asarray(mov_dat), mov_mat)],
        fix=0, cost_fun="nmi", group="SE", samp=2, fwhm=4.0,
        levels=(6.0, 3.0, 2.0))
    # after applying solve(mat_a[1], mov_mat) the images should align:
    # solve(mat_a[1], mov_mat) ~ eye -> mat_a[1] ~ R_true
    aligned = np.linalg.solve(mat_a[1], mov_mat)
    err_t = np.abs(aligned[:3, 3])
    err_r = np.abs(aligned[:3, :3] - np.eye(3))
    assert (err_t < 1.0).all(), aligned  # < 1mm residual
    assert (err_r < 0.02).all(), aligned


def test_affine_align_identity_for_fixed():
    gt = blob_phantom(dim=(24, 24, 24), seed=1)
    mat_a = affine_align([(jnp.asarray(gt), np.eye(4))] * 2, fix=0,
                         levels=(4.0,))
    assert np.allclose(mat_a[0], np.eye(4))


def test_reset_origin_centres_fov():
    dat = jnp.zeros((10, 12, 14), jnp.float32)
    mat = np.eye(4)
    mat[:3, 3] = [100.0, -50.0, 30.0]
    _, new_mat = reset_origin(dat, mat)
    centre = new_mat @ np.array([4.5, 5.5, 6.5, 1.0])
    assert np.allclose(centre[:3], 0.0, atol=1e-9)
    assert np.allclose(voxel_size(new_mat), voxel_size(mat))


def test_atlas_align_bundled_recovers_offset():
    """Out-of-the-box atlas_align (no UNIRES_ATLAS) registers against the
    BUNDLED procedural MNI template: a rigidly displaced copy of the
    template itself must be re-aligned (round-2 VERDICT item 5)."""
    from unires_tpu.data import default_atlas
    from unires_tpu.geometry import affine_basis, expm

    adat, amat = default_atlas()
    assert adat.shape == (91, 109, 109) and adat.max() > 0
    q_true = np.array([6.0, -4.0, 3.0, 0.04, -0.03, 0.05])
    R_true = expm(q_true, affine_basis("SE"))
    # the displaced "subject": same volume, affine premultiplied by R_true
    mat_a = atlas_align((jnp.asarray(adat), R_true @ amat), rigid=True)
    aligned = np.linalg.solve(mat_a, R_true)
    assert np.abs(aligned[:3, 3]).max() < 1.5, aligned
    assert np.abs(aligned[:3, :3] - np.eye(3)).max() < 0.02, aligned


def test_atlas_align_cso_recovers_rigid_and_scale(tmp_path):
    """rigid=False atlas alignment = CSO (SE(3) + isotropic scale), the
    reference's atlas_rigid=False / nitorch mat_cso path (_core.py:345-353)."""
    from unires_tpu.geometry import affine_basis, expm
    from unires_tpu.pipeline.nifti import save

    gt = blob_phantom(dim=(48, 48, 48), amplitude=1000.0, seed=7)
    rng = np.random.default_rng(7)
    atlas_path = str(tmp_path / "atlas.nii.gz")
    save(gt.astype(np.float32), atlas_path, affine=np.eye(4))

    q_true = np.array([2.0, -1.5, 1.0, 0.03, -0.02, 0.025, 0.08])
    C_true = expm(q_true, affine_basis("CSO"))
    mov = (1500.0 * np.sqrt(gt / 1000.0)).astype(np.float32)
    mov = mov + 15.0 * rng.standard_normal(mov.shape).astype(np.float32)
    mat_a = atlas_align((jnp.asarray(mov), C_true @ np.eye(4)), rigid=False,
                        atlas_path=atlas_path)
    aligned = np.linalg.solve(mat_a, C_true)
    assert np.abs(aligned[:3, 3]).max() < 1.0, aligned
    assert np.abs(aligned[:3, :3] - np.eye(3)).max() < 0.025, aligned


def test_affine_align_mean_gauge():
    """gauge='mean': pairwise alignment identical to gauge='fix', but the
    Lie-mean of the corrections is zero (the common frame sits at the mean
    of the input frames instead of inheriting image fix's pose error)."""
    from unires_tpu.geometry import affine_basis, rigid_log

    gt = blob_phantom(dim=(24, 26, 24), seed=3)
    R_true = affine_matrix_classic([2.0, -1.5, 1.0, 0.04, -0.02, 0.03])
    imgs = [(jnp.asarray(gt), np.eye(4)), (jnp.asarray(gt), R_true)]
    a_fix = affine_align(imgs, fix=0, levels=(4.0,), gauge="fix")
    a_mean = affine_align(imgs, fix=0, levels=(4.0,), gauge="mean")
    # same pairwise (relative) alignment
    rel_fix = np.linalg.solve(a_fix[0], a_fix[1])
    rel_mean = np.linalg.solve(a_mean[0], a_mean[1])
    assert np.allclose(rel_fix, rel_mean, atol=1e-9)
    # zero Lie-mean of the corrections
    B = affine_basis("SE")
    qbar = np.mean([rigid_log(a_mean[i], B) for i in range(2)], axis=0)
    assert np.abs(qbar).max() < 1e-6, qbar
