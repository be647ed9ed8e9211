"""Pipeline entry points: init / fit / preproc (reference unires/run.py).

Data flow (reference call stack, SURVEY §3.1): read NIfTI (host) -> device
volumes -> hyper-parameter estimation -> registration init -> output-space
formatting -> projection operators -> initial y -> ADMM fit -> write NIfTI.
"""
from __future__ import annotations

import os
from typing import Any, List, Optional

import jax.numpy as jnp
import numpy as np

from ..geometry import affine_basis
from ..settings import Settings
from ..utils.log import info
from .fit import fit as _fit
from .format_y import format_y, init_y_dat, init_y_label, proj_info_add
from .hyperpar import estimate_hyperpar
from .nifti import load as nifti_load, save as nifti_save
from .structs import Chan, Obs, XData, YData


def _read_image(item, is_ct: bool = False) -> Obs:
    """One observation from a path or an [array, affine] pair
    (reference _util.py:134-197)."""
    o = Obs()
    if isinstance(item, str):
        dat, hdr = nifti_load(item)
        dat = np.squeeze(dat)
        o.mat = np.asarray(hdr.affine, np.float64)
        o.fname = os.path.abspath(item)
        o.direc, o.nam = os.path.split(o.fname)
        o.header = hdr
    else:
        dat, mat = item
        dat = np.squeeze(np.asarray(dat, np.float32))
        o.mat = np.asarray(mat, np.float64)
    dat = np.array(dat, np.float32)  # copy: inputs may be read-only buffers
    dat[~np.isfinite(dat)] = 0.0
    if dat.ndim != 3:
        raise ValueError(
            f"Input image dimension required to be 3D, received {dat.ndim}D!")
    o.dat = jnp.asarray(dat)
    o.dim = tuple(dat.shape)
    o.ct = bool(is_ct)
    return o


def read_data(data, sett) -> XData:
    """Parse nested path/array input into x[c][n] (reference _core.py:495-584)."""
    mat_vol = sett.mat
    if isinstance(data, str):
        dat, hdr = nifti_load(data)
        if dat.ndim > 3:
            mat_vol = hdr.affine
            data = dat
    if hasattr(data, "shape") and mat_vol is None and not isinstance(data, str):
        raise ValueError("Image data given as array, please also provide "
                         "affine matrix in sett.mat!")
    if isinstance(data, str):
        data = [data]

    x: XData = []
    if mat_vol is not None:
        arr = np.asarray(data)
        if arr.ndim == 3:
            arr = arr[..., None]
        for c in range(arr.shape[3]):
            x.append([_read_image([arr[..., c], mat_vol], is_ct=sett.ct)])
    else:
        for c, item in enumerate(data):
            x.append([])
            if isinstance(item, list) and item and isinstance(item[0], (str, list)):
                for sub in item:
                    x[c].append(_read_image(sub, is_ct=sett.ct))
            else:
                x[c].append(_read_image(item, is_ct=sett.ct))

    if sett.label is not None:
        pth, (ci, ni) = sett.label
        dat, hdr = nifti_load(pth)
        if tuple(dat.shape) != tuple(x[ci][ni].dim):
            raise ValueError("Incorrect label dimensions.")
        x[ci][ni].label = [jnp.asarray(dat), hdr]

    info(sett, "filenames", x)
    return x


def init_reg(x: XData, sett):
    """Registration init: co-registration + optional atlas alignment
    (reference _core.py:310-368)."""
    N = sum(len(xc) for xc in x)
    sett.rigid_basis = affine_basis("SE")

    if sett.do_coreg and N > 1:
        from .registration import affine_align

        t0 = info(sett, "init-reg-begin", "co", N)
        imgs = [(o.dat, o.mat) for xc in x for o in xc]
        mat_a = affine_align(imgs, fix=sett.fix,
                             gauge=getattr(sett, "coreg_gauge", "mean"),
                             **sett.coreg_params)
        sett.mat_coreg = mat_a
        i = 0
        for xc in x:
            for o in xc:
                o.mat = np.linalg.solve(mat_a[i], o.mat)
                i += 1
        info(sett, "init-reg-done", t0)

    if sett.do_atlas_align:
        from .registration import atlas_align

        t0 = info(sett, "init-reg-begin", "atlas", N)
        imgs = [(o.dat, o.mat) for xc in x for o in xc]
        mat_a = atlas_align(imgs[sett.fix], rigid=sett.atlas_rigid)
        sett.mat_atlas = mat_a
        for xc in x:
            for o in xc:
                o.mat = np.linalg.solve(mat_a, o.mat)
        info(sett, "init-reg-done", t0)

    for xc in x:
        for o in xc:
            o.rigid_q = np.zeros(sett.rigid_basis.shape[0], np.float64)
    return x, sett


def resample_inplane(x: XData, sett):
    """Downsample in-plane axes finer than the recon voxel size
    (reference _core.py:457-493, force_inplane_res)."""
    if not (sett.force_inplane_res and sett.max_iter > 0):
        return x
    from ..geometry import voxel_size
    from ..ops.resample import affine_to_M, pull
    from .format_y import warp_label

    for xc in x:
        for o in xc:
            vx_x = voxel_size(o.mat)
            D = np.eye(4)
            for i in range(3):
                tgt = sett.vx[i] if isinstance(sett.vx, (list, tuple)) else sett.vx
                D[i, i] = max(1.0, float(tgt) / vx_x[i])
            if np.abs(np.eye(4) - D).sum() < 1e-4:
                continue
            new_dim = tuple(int(v) for v in np.floor(
                np.linalg.inv(D[:3, :3]) @ np.asarray(o.dim, float)))
            M = affine_to_M(D)
            o.dat = pull(o.dat, M, new_dim, order=0)
            if o.label is not None:
                o.label[0] = warp_label(o.label[0], M, new_dim)
            o.mat = o.mat @ D
            o.dim = new_dim
    return x


def fix_affine(x: XData, sett):
    """Reset origin of CT volumes (reference _core.py:145-168)."""
    if not sett.do_res_origin:
        return x
    cnt = 0
    for xc in x:
        for o in xc:
            if o.ct:
                from .registration import reset_origin

                omat = o.mat
                o.dat, o.mat = reset_origin(o.dat, omat)
                if o.label is not None:  # reference resets labels too (:158-160)
                    lab, _ = reset_origin(o.label[0], omat, interpolation=0)
                    o.label[0] = lab
                o.dim = tuple(o.dat.shape)
                cnt += 1
    info(sett, "fix-affine", cnt)
    return x


def init(data, sett: Optional[Settings] = None):
    """Model initialiser (reference run.py:210-282)."""
    sett = sett if sett is not None else Settings()
    info(sett, "init")

    if sett.common_output:
        sett.do_atlas_align = True
        sett.crop = True
        if sett.pow == 0:
            sett.pow = 256

    import time as _time

    _dbg = os.environ.get("UNIRES_TPU_TIMING")
    _t = [_time.time()]

    def _tick(name):
        if _dbg:
            import sys as _sys

            now = _time.time()
            print(f"[init] {name}: {now - _t[0]:.2f}s", file=_sys.stderr,
                  flush=True)
            _t[0] = now

    x = read_data(data, sett)
    _tick("read_data")
    if sett.max_iter > 0:
        x = estimate_hyperpar(x, sett)
        _tick("hyperpar")
    x = fix_affine(x, sett)
    x = resample_inplane(x, sett)
    x, sett = init_reg(x, sett)
    _tick("init_reg")
    y, sett = format_y(x, sett)
    x = proj_info_add(x, y, sett)
    _tick("format_y+proj_info")
    y = init_y_dat(x, y, sett)
    y = init_y_label(x, y, sett)
    if _dbg:
        import jax as _jax

        _jax.block_until_ready(y[0].dat)
    _tick("init_y")
    return x, y, sett


def write_data(x: XData, y: YData, sett, jtv=None):
    """Write reconstructions (reference _core.py:587-670)."""
    mat = y[0].mat
    dir_out = sett.dir_out
    if dir_out is None:
        dir_out = x[0][0].direc if x[0][0].direc else "UniRes-output"
    if sett.write_out and not os.path.isdir(dir_out):
        os.makedirs(dir_out, exist_ok=True)

    pth_y: List[str] = []
    pth_label = None
    label = None
    dat_stack = []
    for c in range(len(x)):
        dat = y[c].dat
        mn = min(float(jnp.min(o.dat)) for o in x[c])
        mx = max(float(jnp.max(o.dat)) for o in x[c])
        dat = jnp.clip(dat, mn, mx)
        dat_stack.append(np.asarray(dat))
        if sett.write_out and sett.mat is None:
            nam = x[c][0].nam if x[c][0].nam else f"{c}.nii.gz"
            fname = os.path.join(dir_out, _tag(sett, sett.prefix + nam))
            pth_y.append(fname)
            nifti_save(np.asarray(dat), fname, affine=mat)
            info(sett, "saved", fname)
            if y[c].label is not None:
                pth_label = os.path.join(
                    dir_out, _tag(sett, sett.prefix + "label_" + nam))
                label = y[c].label
                nifti_save(np.asarray(label), pth_label, affine=mat)

    dat_y = np.stack(dat_stack, axis=-1)
    if sett.write_out and sett.mat is not None:
        nam = x[0][0].nam if x[0][0].nam else "0.nii.gz"
        fname = os.path.join(dir_out, _tag(sett, sett.prefix + nam))
        pth_y.append(fname)
        nifti_save(dat_y, fname, affine=mat)
        info(sett, "saved", fname)

    if sett.write_jtv and jtv is not None:
        nam = x[0][0].nam if x[0][0].nam else "0.nii.gz"
        fname = os.path.join(dir_out, _tag(sett, "jtv_" + sett.prefix + nam))
        nifti_save(np.asarray(jtv), fname, affine=mat)
        info(sett, "saved", fname)

    return dat_y, pth_y, label, pth_label


def _tag(sett, nam: str) -> str:
    """BIDS '_space-unires_' tag (reference _util.py:215-222)."""
    if not sett.bids:
        return nam
    s = nam.split("_")
    return "_".join(s[:-1] + ["space-unires"] + [s[-1]])


def fit(x: XData, y: YData, sett):
    """Fit + write (reference run.py:24-207 public behavior).

    Returns (dat_y, mat_y, pth_y, R, label, pth_label).
    """
    y, R, jtv, obj, n_iter = _fit(x, y, sett)
    dat_y, pth_y, label, pth_label = write_data(x, y, sett, jtv=jtv)
    return dat_y, y[0].mat, pth_y, R, label, pth_label


def preproc(data, sett: Optional[Settings] = None):
    """One-call API (reference run.py:285-318)."""
    x, y, sett = init(data, sett)
    dat_y, mat_y, pth_y, _, _, _ = fit(x, y, sett)
    return dat_y, mat_y, pth_y


def fit_batch(xs, ys, setts):
    """Sharded multi-subject fit + write (extension; no reference analog —
    the reference is single-device, SURVEY §2.3).

    ``xs``/``ys``/``setts``: per-subject struct lists from :func:`init`.
    The solve runs data-parallel over a ('batch',) device mesh
    (parallel.fit_batch) — each device executes the full per-subject
    algorithm, so results match per-subject :func:`fit` runs. Returns a list
    of (dat_y, mat_y, pth_y, R, label, pth_label) per subject.
    """
    from ..parallel.fit_batch import fit_batch as _fit_batch

    results = _fit_batch(xs, ys, setts[0])
    out = []
    for (x, sett), (y, R, jtv, obj, n_iter) in zip(
            [(x, s) for x, s in zip(xs, setts)], results):
        dat_y, pth_y, label, pth_label = write_data(x, y, sett, jtv=jtv)
        out.append((dat_y, y[0].mat, pth_y, R, label, pth_label))
    return out


def preproc_batch(subjects, sett: Optional[Settings] = None):
    """One-call batch API: init every subject, fit sharded, write every.

    ``subjects``: list of per-subject inputs (each as :func:`preproc`'s
    ``data``). Requires a geometry-homogeneous batch (same acquisition
    protocol; parallel.fit_batch.check_homogeneous raises otherwise).
    Returns a list of (dat_y, mat_y, pth_y) per subject.
    """
    sett = sett if sett is not None else Settings()
    if not sett.shard:
        sett.shard = "batch"
    inits = []
    for data in subjects:
        # init mutates settings (method, schedule, rigid basis) — per copy.
        # Subjects 1.. reconstruct on subject 0's output grid so the batch
        # is geometry-homogeneous (with common_output all subjects land on
        # the atlas grid already).
        sb = sett.copy()
        if inits and not sett.common_output:
            y0 = inits[0][1]
            sb.force_y_space = (y0[0].mat, y0[0].dim)
        xb, yb, sb = init(data, sb)
        inits.append((xb, yb, sb))
    res = fit_batch([i[0] for i in inits], [i[1] for i in inits],
                    [i[2] for i in inits])
    return [(dat_y, mat_y, pth_y) for dat_y, mat_y, pth_y, _, _, _ in res]
