"""ctypes binding to the native (C++) runtime library.

The reference's host-side runtime (sparsity builders, DoF numbering) is
C++ compiled by CMake (femutils/CMakeLists.txt); ours is a small shared
library built by native/Makefile and loaded here.  Auto-builds on first
import if the toolchain is available; consumers fall back to the pure-NumPy
implementations when the library is absent.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libafem_native.so")

_lib = None
_tried = False


def library():
    """The loaded native library, or None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-s", "-C", _NATIVE_DIR],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.afem_topo_build.restype = ctypes.c_void_p
    lib.afem_topo_build.argtypes = [
        ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
    ]
    lib.afem_topo_width.restype = ctypes.c_int32
    lib.afem_topo_width.argtypes = [ctypes.c_void_p]
    lib.afem_topo_nnz.restype = ctypes.c_int64
    lib.afem_topo_nnz.argtypes = [ctypes.c_void_p]
    lib.afem_topo_fill.restype = None
    lib.afem_topo_fill.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 7
    lib.afem_topo_free.restype = None
    lib.afem_topo_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def build_topology_native(n_nodes: int, buckets: dict, pad_width_to: int):
    """Native counterpart of sparse.topology.build_topology.

    Returns the same tuple of arrays or None if the library is unavailable.
    """
    lib = library()
    if lib is None:
        return None
    names = list(buckets)
    conns = [np.ascontiguousarray(buckets[k], np.int32) for k in names]
    ptrs = (ctypes.c_void_p * len(conns))(
        *[c.ctypes.data_as(ctypes.c_void_p) for c in conns]
    )
    ncs = (ctypes.c_int64 * len(conns))(*[c.shape[0] for c in conns])
    npcs = (ctypes.c_int32 * len(conns))(*[c.shape[1] for c in conns])
    h = lib.afem_topo_build(n_nodes, len(conns), ptrs, ncs, npcs, pad_width_to)
    if not h:
        return None
    try:
        width = lib.afem_topo_width(h)
        nnz = lib.afem_topo_nnz(h)
        row_ptr = np.empty(n_nodes + 1, np.int64)
        csr_cols = np.empty(nnz, np.int32)
        csr_to_ell = np.empty(nnz, np.int32)
        diag_slot = np.empty(n_nodes, np.int32)
        ell_cols = np.empty((n_nodes, width), np.int32)
        ell_valid = np.empty((n_nodes, width), np.uint8)
        smaps = [
            np.empty((c.shape[0], c.shape[1], c.shape[1]), np.int32)
            for c in conns
        ]
        sm_ptrs = (ctypes.c_void_p * len(conns))(
            *[m.ctypes.data_as(ctypes.c_void_p) for m in smaps]
        )
        lib.afem_topo_fill(
            h,
            row_ptr.ctypes.data_as(ctypes.c_void_p),
            csr_cols.ctypes.data_as(ctypes.c_void_p),
            csr_to_ell.ctypes.data_as(ctypes.c_void_p),
            diag_slot.ctypes.data_as(ctypes.c_void_p),
            ell_cols.ctypes.data_as(ctypes.c_void_p),
            ell_valid.ctypes.data_as(ctypes.c_void_p),
            ctypes.cast(sm_ptrs, ctypes.c_void_p),
        )
    finally:
        lib.afem_topo_free(h)
    return (
        width, row_ptr, csr_cols, csr_to_ell, diag_slot,
        ell_cols, ell_valid.astype(bool),
        {name: m for name, m in zip(names, smaps)},
    )
