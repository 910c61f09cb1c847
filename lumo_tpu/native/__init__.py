"""Native (C++) host runtime for lumo_tpu.

The device side of the framework is JAX/XLA; the host side — accel-
structure construction over millions of primitives (the reference's
SAH sweeps, ``src/tracer/object/bvh/node.rs`` / ``kdtree/node.rs``, are
tight sequential loops that a Python stand-in cannot match) — lives here
as a C++ shared library with a plain C ABI, loaded via ctypes.

The library is compiled on first use with g++ (-O3 -march=native) and
cached next to the source; every entry point has a pure-numpy fallback in
``lumo_tpu.accel.build`` so the framework works without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRCS = [os.path.join(_DIR, "bvh_builder.cpp"),
         os.path.join(_DIR, "kdtree_builder.cpp")]
_SO = os.path.join(_DIR, "_lumo_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _compile() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-pthread", *_SRCS, "-o", _SO + ".tmp"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(_SO + ".tmp", _SO)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def load():
    """Return the ctypes library, compiling if needed; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or any(
                os.path.getmtime(_SO) < os.path.getmtime(s) for s in _SRCS):
            if not _compile():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.lumo_build_bvh.restype = ctypes.c_int
        lib.lumo_build_bvh.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.lumo_build_kdtree.restype = ctypes.c_int
        lib.lumo_build_kdtree.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
        return _lib


def build_bvh(prim_lo: np.ndarray, prim_hi: np.ndarray):
    """Native binned-SAH build. Returns the same tuple of arrays as the
    numpy builder, or None when the native library is unavailable."""
    lib = load()
    if lib is None:
        return None
    P = len(prim_lo)
    lo = np.ascontiguousarray(prim_lo, np.float32)
    hi = np.ascontiguousarray(prim_hi, np.float32)
    M = max(2 * P - 1, 1)
    node_lo = np.empty((M, 3), np.float32)
    node_hi = np.empty((M, 3), np.float32)
    node_right = np.empty(M, np.int32)
    node_first = np.empty(M, np.int32)
    node_count = np.empty(M, np.int32)
    node_axis = np.empty(M, np.int32)
    order = np.empty(P, np.int32)
    n_nodes = ctypes.c_int64(0)
    max_depth = ctypes.c_int32(0)
    fp = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    ip = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    rc = lib.lumo_build_bvh(
        fp(lo), fp(hi), ctypes.c_int64(P),
        fp(node_lo), fp(node_hi), ip(node_right), ip(node_first),
        ip(node_count), ip(node_axis), ip(order),
        ctypes.byref(n_nodes), ctypes.byref(max_depth))
    if rc != 0:
        return None
    M = n_nodes.value
    return (node_lo[:M], node_hi[:M], node_right[:M], node_first[:M],
            node_count[:M], node_axis[:M], order, int(max_depth.value))


def build_kdtree(prim_lo: np.ndarray, prim_hi: np.ndarray):
    """Native Wald-Havran SAH kd-tree build.  Returns (split, axis, right,
    first, count, prims, root_lo, root_hi, max_depth) or None when the
    native library is unavailable."""
    lib = load()
    if lib is None:
        return None
    P = len(prim_lo)
    lo = np.ascontiguousarray(prim_lo, np.float32)
    hi = np.ascontiguousarray(prim_hi, np.float32)
    node_cap = max(8 * P, 64)
    ref_cap = max(16 * P, 1024)
    for _ in range(3):
        split = np.empty(node_cap, np.float32)
        axis = np.empty(node_cap, np.int32)
        right = np.empty(node_cap, np.int32)
        first = np.empty(node_cap, np.int32)
        count = np.empty(node_cap, np.int32)
        prims = np.empty(ref_cap, np.int32)
        root_lo = np.empty(3, np.float32)
        root_hi = np.empty(3, np.float32)
        n_nodes = ctypes.c_int64(0)
        n_refs = ctypes.c_int64(0)
        max_depth = ctypes.c_int32(0)
        fp = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        ip = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        rc = lib.lumo_build_kdtree(
            fp(lo), fp(hi), ctypes.c_int64(P),
            ctypes.c_int64(node_cap), ctypes.c_int64(ref_cap),
            fp(split), ip(axis), ip(right), ip(first), ip(count), ip(prims),
            fp(root_lo), fp(root_hi),
            ctypes.byref(n_nodes), ctypes.byref(n_refs),
            ctypes.byref(max_depth))
        if rc == 0:
            M, R = n_nodes.value, n_refs.value
            return (split[:M], axis[:M], right[:M], first[:M], count[:M],
                    prims[:R], root_lo, root_hi, int(max_depth.value))
        if rc != 2:
            return None
        node_cap *= 4
        ref_cap *= 4
    return None
