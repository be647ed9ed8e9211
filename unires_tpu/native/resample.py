"""numpy front-end to the native resampling trio (ctypes)."""
from __future__ import annotations

import ctypes

import numpy as np

from .build import get_lib


def _prep(vol, M, out_dim):
    vol = np.ascontiguousarray(vol, np.float32)
    M = np.ascontiguousarray(np.asarray(M, np.float32).reshape(3, 4))
    in_dim = np.asarray(vol.shape, np.int64)
    out_dim = np.asarray([int(d) for d in out_dim], np.int64)
    return vol, M, in_dim, out_dim


def _ptr(a, typ):
    return a.ctypes.data_as(ctypes.POINTER(typ))


def pull_np(vol, M, out_dim, order: int = 1) -> np.ndarray:
    """Native pull: sample vol at g = M @ (i,j,k,1) (zero bound, no extrap)."""
    vol, M, in_dim, out_dim = _prep(vol, M, out_dim)
    out = np.empty(tuple(out_dim), np.float32)
    get_lib().unires_pull_f32(
        _ptr(vol, ctypes.c_float), _ptr(in_dim, ctypes.c_int64),
        _ptr(M, ctypes.c_float), _ptr(out_dim, ctypes.c_int64),
        ctypes.c_int(order), _ptr(out, ctypes.c_float))
    return out


def push_np(vals, M, vol_dim, order: int = 1) -> np.ndarray:
    """Native exact adjoint of pull_np."""
    vals, M, vals_dim, vol_dim = _prep(vals, M, vol_dim)
    out = np.empty(tuple(vol_dim), np.float32)
    get_lib().unires_push_f32(
        _ptr(vals, ctypes.c_float), _ptr(vals_dim, ctypes.c_int64),
        _ptr(M, ctypes.c_float), _ptr(vol_dim, ctypes.c_int64),
        ctypes.c_int(1 if order else 0), _ptr(out, ctypes.c_float))
    return out


def pull_grad_np(vol, M, out_dim) -> np.ndarray:
    """Native d pull / d g, shape out_dim + (3,)."""
    vol, M, in_dim, out_dim = _prep(vol, M, out_dim)
    out = np.empty(tuple(out_dim) + (3,), np.float32)
    get_lib().unires_pull_grad_f32(
        _ptr(vol, ctypes.c_float), _ptr(in_dim, ctypes.c_int64),
        _ptr(M, ctypes.c_float), _ptr(out_dim, ctypes.c_int64),
        _ptr(out, ctypes.c_float))
    return out
