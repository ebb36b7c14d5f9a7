"""ctypes bindings to the C++ native runtime (native/psdr_native.cpp).

The shared library is built on demand with g++ and cached next to the
package; every entry point has a pure-Python fallback, so the framework
works (slower) without a compiler.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native", "psdr_native.cpp")
_DIR = os.path.dirname(os.path.abspath(__file__))


def _build() -> str | None:
    # Cache keyed on a source digest, so editing the .cpp always rebuilds
    # (mtime comparison is unreliable after checkout: equal mtimes would
    # silently keep a stale or wrong-arch binary).
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    out = os.path.join(_DIR, f"libpsdr_native-{digest}.so")
    if os.path.exists(out):
        return out
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
             "-o", out],
            check=True, capture_output=True, timeout=120)
    except (OSError, subprocess.SubprocessError):
        return None
    for old in os.listdir(_DIR):  # drop superseded builds
        if (old.startswith("libpsdr_native") and old.endswith(".so")
                and old != os.path.basename(out)):
            try:
                os.remove(os.path.join(_DIR, old))
            except OSError:
                pass
    return out


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        path = _build()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        lib.obj_load.restype = ctypes.c_void_p
        lib.obj_load.argtypes = [ctypes.c_char_p]
        lib.obj_counts.argtypes = [ctypes.c_void_p] + \
            [ctypes.POINTER(ctypes.c_int32)] * 6
        lib.obj_copy.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 6
        lib.obj_free.argtypes = [ctypes.c_void_p]
        lib.build_edges.restype = ctypes.c_int32
        lib.build_edges.argtypes = [ctypes.c_void_p, ctypes.c_int32,
                                    ctypes.c_void_p, ctypes.c_int32]
        lib.morton_num_leaves.restype = ctypes.c_int32
        lib.morton_num_leaves.argtypes = [ctypes.c_int32, ctypes.c_int32]
        lib.morton_topology.argtypes = [ctypes.c_void_p] * 3 + \
            [ctypes.c_int32, ctypes.c_int32, ctypes.c_void_p, ctypes.c_void_p]
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


def obj_load(path: str):
    """Parse an OBJ file -> (verts (V,3) f32, faces (F,3) i32,
    uvs (T,2) f32 | None, fuvs (F,3) i32 | None, normals (N,3) f32 | None,
    fnrm (F,3) i32 | None). None if lib unavailable."""
    lib = _load()
    if lib is None:
        return None
    h = lib.obj_load(path.encode())
    if not h:
        raise FileNotFoundError(path)
    try:
        nv, nf, nt, nn, has_uv, has_nrm = (ctypes.c_int32() for _ in range(6))
        lib.obj_counts(h, ctypes.byref(nv), ctypes.byref(nf),
                       ctypes.byref(nt), ctypes.byref(nn),
                       ctypes.byref(has_uv), ctypes.byref(has_nrm))
        verts = np.empty((nv.value, 3), np.float32)
        faces = np.empty((nf.value, 3), np.int32)
        uvs = np.empty((max(nt.value, 1), 2), np.float32)
        fuvs = np.empty((nf.value, 3), np.int32)
        nrms = np.empty((max(nn.value, 1), 3), np.float32)
        fnrm = np.empty((nf.value, 3), np.int32)
        lib.obj_copy(h, verts.ctypes.data, faces.ctypes.data,
                     uvs.ctypes.data, fuvs.ctypes.data,
                     nrms.ctypes.data, fnrm.ctypes.data)
        use_uv = has_uv.value and nt.value > 0
        use_n = has_nrm.value and nn.value > 0
        return (verts, faces, uvs[:nt.value] if use_uv else None,
                fuvs if use_uv else None,
                nrms[:nn.value] if use_n else None,
                fnrm if use_n else None)
    finally:
        lib.obj_free(h)


def build_edges(faces: np.ndarray) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    faces = np.ascontiguousarray(faces, np.int32)
    nf = faces.shape[0]
    out = np.empty((nf * 3, 5), np.int32)
    ne = lib.build_edges(faces.ctypes.data, nf, out.ctypes.data, nf * 3)
    if ne == -1:
        raise ValueError("Non-manifold mesh: edge shared by more than 2 faces")
    if ne == -2:
        raise ValueError("Duplicated faces sharing an edge")
    return np.ascontiguousarray(out[:ne])


def morton_topology(p0: np.ndarray, e1: np.ndarray, e2: np.ndarray,
                    leaf_size: int):
    """-> (perm (P*L,) i32, skip (2P,) i32, P) or None."""
    lib = _load()
    if lib is None:
        return None
    p0 = np.ascontiguousarray(p0, np.float32)
    e1 = np.ascontiguousarray(e1, np.float32)
    e2 = np.ascontiguousarray(e2, np.float32)
    nf = p0.shape[0]
    P = lib.morton_num_leaves(nf, leaf_size)
    perm = np.empty(P * leaf_size, np.int32)
    skip = np.empty(2 * P, np.int32)
    lib.morton_topology(p0.ctypes.data, e1.ctypes.data, e2.ctypes.data,
                        nf, leaf_size, perm.ctypes.data, skip.ctypes.data)
    return perm, skip, P
