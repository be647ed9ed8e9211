"""Native (C++) runtime components, bound via ctypes.

Compiled on first use with g++ (cached in the package dir); no pybind11 in
the environment. See resample.cpp for the resampling trio.
"""
from .build import get_lib  # noqa: F401
from .resample import pull_np, push_np, pull_grad_np  # noqa: F401
