"""Minimal API example (mirrors the reference demos/simple_api_use.py).

Give UniRes-TPU a bunch of NIfTI paths (or (array, affine) pairs) and get
1 mm isotropic reconstructions back.
"""
import sys

from unires_tpu import Settings, preproc

if __name__ == "__main__":
    paths = sys.argv[1:]
    if not paths:
        print("usage: python simple_api_use.py t1.nii [t2.nii pd.nii ...]")
        sys.exit(1)

    sett = Settings()
    sett.vx = 1.0           # reconstruction voxel size (0 -> denoise only)
    sett.do_coreg = True    # NMI rigid co-registration of the inputs
    sett.scaling = True     # estimate even/odd (interleave) intensity scaling
    sett.unified_rigid = True  # refine rigid poses during the fit

    dat_y, mat_y, pth_y = preproc(paths, sett)
    print("Reconstructed volumes:")
    for p in pth_y:
        print("  ", p)
