"""ctypes bindings for the native host library (native/hpsdf_native.cpp).

The reference's data pipeline is C++ (Meshing::ObjParser,
Source/Meshing/ObjParser.cpp; Mesh::CreateHalfEdges, Mesh.cpp:87-131); this
framework keeps those host-side stages native as well. The shared library is
compiled on first use (g++, see native/Makefile); if no toolchain or source
is available every caller falls back to the pure-numpy implementations in
mesh/obj.py and mesh/core.py, which remain the behavioral oracles.

Set HPSDF_NO_NATIVE=1 to force the Python paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_NATIVE_DIR = os.path.join(os.path.dirname(_PKG_DIR), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libhpsdf_native.so")

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False


class _ObjData(ctypes.Structure):
    _fields_ = [
        ("verts", ctypes.POINTER(ctypes.c_double)),
        ("normals", ctypes.POINTER(ctypes.c_double)),
        ("faces", ctypes.POINTER(ctypes.c_int32)),
        ("n_verts", ctypes.c_int64),
        ("n_faces", ctypes.c_int64),
    ]


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "hpsdf_native.cpp")
    if not os.path.exists(src):
        return False
    # compile to a temp file + atomic rename: never truncate a .so that an
    # older CDLL may still have mapped, and give dlopen a fresh inode so a
    # stale-version reload actually picks up the new code
    tmp = _LIB_PATH + f".tmp{os.getpid()}"
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-fPIC", "-shared",
             "-o", tmp, src],
            check=True, capture_output=True, timeout=300)
        os.replace(tmp, _LIB_PATH)
        return True
    except (OSError, subprocess.SubprocessError):
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def _load() -> ctypes.CDLL | None:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("HPSDF_NO_NATIVE", "0") == "1":
            return None
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        # stale .so from an older source revision: rebuild + reload once
        try:
            lib.hpsdf_version.restype = ctypes.c_char_p
            stale = lib.hpsdf_version() != b"hpsdf_native 4"
        except AttributeError:
            stale = True
        if stale:
            if not _build():
                return None
            try:
                lib = ctypes.CDLL(_LIB_PATH)
            except OSError:
                return None
        lib.hpsdf_parse_obj.restype = ctypes.c_int
        lib.hpsdf_parse_obj.argtypes = [ctypes.c_char_p,
                                        ctypes.POINTER(_ObjData)]
        lib.hpsdf_free_obj.argtypes = [ctypes.POINTER(_ObjData)]
        lib.hpsdf_half_edges.restype = ctypes.c_int
        lib.hpsdf_half_edges.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32)]
        lib.hpsdf_kd_order.restype = None
        lib.hpsdf_kd_order.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32)]
        lib.hpsdf_pack_tris.restype = None
        lib.hpsdf_pack_tris.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_float, ctypes.POINTER(ctypes.c_float)]
        lib.hpsdf_bvh_nodes.restype = None
        lib.hpsdf_bvh_nodes.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float)]
        lib.hpsdf_mesh_geom.restype = None
        lib.hpsdf_mesh_geom.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double)]
        _lib = lib
        return _lib


def available() -> bool:
    """True when the native library is loaded (building it if needed)."""
    return _load() is not None


def load_obj(path: str):
    """Native .obj parse. Returns (vertices (V,3) f64, faces (F,3) i32,
    vertex normals (V,3) f64) with the exact semantics of
    mesh.obj.load_obj, or None if the native library is unavailable.
    Raises OSError / ValueError on unreadable / malformed files."""
    lib = _load()
    if lib is None:
        return None
    data = _ObjData()
    rc = lib.hpsdf_parse_obj(os.fsencode(path), ctypes.byref(data))
    if rc == 1:
        raise OSError(f"cannot open {path!r}")
    if rc != 0:
        raise ValueError(f"malformed .obj file {path!r}")
    try:
        V, F = data.n_verts, data.n_faces
        v = np.ctypeslib.as_array(data.verts, (V, 3)).copy() if V else \
            np.zeros((0, 3), np.float64)
        n = np.ctypeslib.as_array(data.normals, (V, 3)).copy() if V else \
            np.zeros((0, 3), np.float64)
        f = np.ctypeslib.as_array(data.faces, (F, 3)).copy() if F else \
            np.zeros((0, 3), np.int32)
    finally:
        lib.hpsdf_free_obj(ctypes.byref(data))
    return v, f, n


def half_edge_twins(faces: np.ndarray, n_verts: int):
    """Native half-edge pairing. faces: (F, 3) int32. Returns the (3F,)
    int32 twin array, or None if the native library is unavailable.
    Raises mesh.core.NotWatertightError on boundary / non-manifold /
    mis-oriented edges (same contract as the numpy path)."""
    lib = _load()
    if lib is None:
        return None
    fc = np.ascontiguousarray(faces, np.int32)
    twin = np.empty(3 * fc.shape[0], np.int32)
    rc = lib.hpsdf_half_edges(
        fc.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        fc.shape[0], int(n_verts),
        twin.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if rc != 0:
        from .mesh.core import NotWatertightError
        raise NotWatertightError(
            "unpaired edge (boundary or non-manifold)" if rc == 1
            else "inconsistently oriented edge pair")
    return twin


def kd_order(cent: np.ndarray, T2: int):
    """Native recursive median-split ordering (mesh.bvh.kd_order contract):
    cent (T,3) centroids -> (T2,) int32 permutation of slot ids where values
    >= T are dummy tail slots. O(n log n) via nth_element per segment vs the
    numpy path's full argsort per level. None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    c = np.ascontiguousarray(cent, np.float32)
    out = np.empty(T2, np.int32)
    lib.hpsdf_kd_order(
        c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        c.shape[0], int(T2),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out


def pack_tri_rows(verts, faces, face_n, vertex_pn, edge_pn,
                  order, slots, T2: int, big: float):
    """Native packed-triangle-row fill (mesh.bvh.pack_triangles + scatter):
    returns (T2, 32) f32 rows, ``big`` everywhere except row slots[k] =
    packed triangle order[k]. None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    v = np.ascontiguousarray(verts, np.float64)
    fc = np.ascontiguousarray(faces, np.int32)
    fn = np.ascontiguousarray(face_n, np.float64)
    vpn = np.ascontiguousarray(vertex_pn, np.float64)
    epn = np.ascontiguousarray(edge_pn, np.float64)
    od = np.ascontiguousarray(order, np.int32)
    sl = np.ascontiguousarray(slots, np.int64)
    rows = np.empty((T2, 32), np.float32)
    lib.hpsdf_pack_tris(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        fc.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        fn.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        vpn.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        epn.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        od.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        sl.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        od.size, int(T2), float(big),
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return rows


def mesh_geom(verts: np.ndarray, faces: np.ndarray, twin: np.ndarray):
    """Native pseudo-normal precompute (mesh.core.build_mesh's geometry
    phase): returns (face_normals (F,3), vertex_pn (V,3), edge_pn (F,3,3)),
    all f64 unit vectors, or None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    v = np.ascontiguousarray(verts, np.float64)
    fc = np.ascontiguousarray(faces, np.int32)
    tw = np.ascontiguousarray(twin, np.int32).ravel()
    F = fc.shape[0]
    fn = np.empty((F, 3), np.float64)
    vpn = np.empty((v.shape[0], 3), np.float64)
    epn = np.empty((F, 3, 3), np.float64)
    lib.hpsdf_mesh_geom(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        fc.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        tw.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        v.shape[0], F,
        fn.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        vpn.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        epn.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return fn, vpn, epn


def bvh_node_rows(tri_rows: np.ndarray):
    """Native heap-node-row build (mesh.bvh.build_bvh's leaf-AABB + level
    union stages): tri_rows (T2, 32) f32 -> (T2, 16) f32 node rows. None if
    the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    tr = np.ascontiguousarray(tri_rows, np.float32)
    out = np.empty((tr.shape[0], 16), np.float32)
    lib.hpsdf_bvh_nodes(
        tr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        tr.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
