"""Native (C++) runtime components with build-on-demand ctypes bindings.

- ``clothoid_oracle``: independent f64 G1-Hermite solver used as the test
  oracle for the JAX clothoid solver (the pyclothoids role, without sharing
  any numerical kernels with the device path);
- ``TableStore``: memory-mapped binary solution-table store (the native
  data-loader: O(1) open, random-index gather for permutation batching,
  append streaming from sharded datagen);
- ``edt``: exact multithreaded Euclidean distance transform (Felzenszwalb)
  building the occupancy-map distance field host-side (the scipy EDT role in
  the reference's scan simulator, laser_models.py:36-50).

The shared library is compiled from ``native/*.cpp`` with g++ on first use
and cached next to the sources; all consumers degrade gracefully (tests skip,
loaders fall back to npz) when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libirbfn_native.so"))
_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    srcs = [os.path.join(_NATIVE_DIR, f)
            for f in ("clothoid_oracle.cpp", "table_io.cpp", "edt.cpp")]
    if not all(os.path.exists(s) for s in srcs):
        return False
    newest_src = max(os.path.getmtime(s) for s in srcs)
    if (os.path.exists(_LIB_PATH)
            and os.path.getmtime(_LIB_PATH) >= newest_src):
        return True
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           "-o", _LIB_PATH] + srcs
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not _build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    c = ctypes.c_double
    lib.clothoid_g1_solve.restype = ctypes.c_int
    lib.clothoid_g1_solve.argtypes = [c] * 6 + [ctypes.POINTER(c)] * 3
    lib.clothoid_g1_solve_batch.restype = None
    lib.clothoid_g1_solve_batch.argtypes = [
        ctypes.POINTER(c), ctypes.c_int64, ctypes.POINTER(c),
        ctypes.POINTER(ctypes.c_int32)]
    lib.table_create.restype = ctypes.c_int
    lib.table_create.argtypes = [ctypes.c_char_p, ctypes.c_uint32,
                                 ctypes.c_uint32]
    lib.table_append.restype = ctypes.c_int
    lib.table_append.argtypes = [ctypes.c_char_p] + [
        ctypes.POINTER(ctypes.c_float)] * 3 + [ctypes.c_uint64]
    lib.table_open.restype = ctypes.c_void_p
    lib.table_open.argtypes = [ctypes.c_char_p]
    lib.table_rows.restype = ctypes.c_uint64
    lib.table_rows.argtypes = [ctypes.c_void_p]
    lib.table_in_dim.restype = ctypes.c_uint32
    lib.table_in_dim.argtypes = [ctypes.c_void_p]
    lib.table_out_dim.restype = ctypes.c_uint32
    lib.table_out_dim.argtypes = [ctypes.c_void_p]
    lib.table_gather.restype = ctypes.c_uint64
    lib.table_gather.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float)]
    lib.table_read_range.restype = ctypes.c_uint64
    lib.table_read_range.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float)]
    lib.table_close.restype = None
    lib.table_close.argtypes = [ctypes.c_void_p]
    lib.edt_f32.restype = None
    lib.edt_f32.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_float, ctypes.POINTER(ctypes.c_float)]
    _lib = lib
    return lib


def available() -> bool:
    return load() is not None


def clothoid_oracle(goals: np.ndarray):
    """Solve (N, 3) [x, y, theta] goals with the C++ oracle.

    Returns (params (N, 5) [k0,k1,k2,k3,s], status (N,); 0 = ok).
    """
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    goals = np.ascontiguousarray(goals, np.float64)
    n = goals.shape[0]
    out = np.empty((n, 5), np.float64)
    status = np.empty((n,), np.int32)
    lib.clothoid_g1_solve_batch(
        goals.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out, status


def edt(free: np.ndarray, resolution: float = 1.0) -> np.ndarray:
    """Exact EDT of a binary grid (nonzero = free): per-cell distance in
    meters to the nearest obstacle cell (0 inside obstacles). Matches
    ``resolution * scipy.ndimage.distance_transform_edt(free != 0)``."""
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    free = np.ascontiguousarray(np.asarray(free) != 0, np.uint8)
    h, w = free.shape
    out = np.empty((h, w), np.float32)
    lib.edt_f32(free.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
                resolution,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def _fp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class TableStore:
    """Memory-mapped solution-table store (see module docstring)."""

    def __init__(self, path: str):
        self.path = path
        self._handle = None

    @staticmethod
    def create(path: str, in_dim: int, out_dim: int) -> "TableStore":
        lib = load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        rc = lib.table_create(path.encode(), in_dim, out_dim)
        if rc != 0:
            raise OSError(f"table_create failed ({rc}) for {path}")
        return TableStore(path)

    def append(self, inputs: np.ndarray, outputs: np.ndarray,
               valid: np.ndarray):
        from irbfn_tpu.parallel.datagen import controls_block

        lib = load()
        inputs = np.ascontiguousarray(inputs, np.float32)
        # (N, T, 2) control sequences flatten to the canonical BLOCK layout
        outputs = np.ascontiguousarray(controls_block(outputs), np.float32)
        valid = np.ascontiguousarray(valid, np.float32)
        rc = lib.table_append(self.path.encode(), _fp(inputs), _fp(outputs),
                              _fp(valid), inputs.shape[0])
        if rc != 0:
            raise OSError(f"table_append failed ({rc})")

    def open(self):
        lib = load()
        self._handle = lib.table_open(self.path.encode())
        if not self._handle:
            raise OSError(f"table_open failed for {self.path}")
        return self

    def __enter__(self):
        return self.open()

    def __exit__(self, *exc):
        self.close()

    @property
    def n_rows(self) -> int:
        return load().table_rows(self._handle)

    @property
    def in_dim(self) -> int:
        return load().table_in_dim(self._handle)

    @property
    def out_dim(self) -> int:
        return load().table_out_dim(self._handle)

    def gather(self, indices: np.ndarray):
        """Random-index batch read (permutation mini-batching)."""
        lib = load()
        indices = np.ascontiguousarray(indices, np.int64)
        n = indices.shape[0]
        inputs = np.empty((n, self.in_dim), np.float32)
        outputs = np.empty((n, self.out_dim), np.float32)
        valid = np.empty((n,), np.float32)
        got = lib.table_gather(
            self._handle, indices.ctypes.data_as(
                ctypes.POINTER(ctypes.c_int64)), n,
            _fp(inputs), _fp(outputs), _fp(valid))
        return inputs[:got], outputs[:got], valid[:got] > 0.5

    def read_range(self, start: int, n: int):
        lib = load()
        inputs = np.empty((n, self.in_dim), np.float32)
        outputs = np.empty((n, self.out_dim), np.float32)
        valid = np.empty((n,), np.float32)
        got = lib.table_read_range(self._handle, start, n, _fp(inputs),
                                   _fp(outputs), _fp(valid))
        return inputs[:got], outputs[:got], valid[:got] > 0.5

    def close(self):
        if self._handle:
            load().table_close(self._handle)
            self._handle = None
