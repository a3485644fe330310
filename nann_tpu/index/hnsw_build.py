"""HNSW index construction (native C++ builder via ctypes).

Build-time equivalent of the reference's faiss-based offline index build
(NANN_impls/nann/delivery/build_hnsw_index.py:33-67) with the identical npy
artifact contract:

    neighbors_level_{l}_values.npy      int64 CSR values, levels 0..start-1
    neighbors_level_{l}_row_splits.npy  int64 CSR row splits, [num_items+1]
    enter_points.npy                    int64 node ids with level > start_level

The graph itself is built by native/hnsw.cc (from-scratch HNSW with the faiss
parameterisation: mult=1/ln(M), 2M ground-level neighbors, heuristic shrink).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Tuple

import numpy as np

from ..utils import get_logger

logger = get_logger("nann_tpu.index")

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libnann_hnsw.so"))
_lib = None


def _load_lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        logger.info("building native hnsw library")
        subprocess.run(["make", "-C", os.path.dirname(_LIB_PATH),
                        "libnann_hnsw.so"], check=True, capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    lib.nann_hnsw_build.restype = ctypes.c_void_p
    lib.nann_hnsw_build.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_uint64, ctypes.c_int]
    lib.nann_hnsw_max_level.restype = ctypes.c_int
    lib.nann_hnsw_max_level.argtypes = [ctypes.c_void_p]
    lib.nann_hnsw_levels.argtypes = [ctypes.c_void_p,
                                     ctypes.POINTER(ctypes.c_int32)]
    lib.nann_hnsw_level_nnz.restype = ctypes.c_int64
    lib.nann_hnsw_level_nnz.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.nann_hnsw_level_csr.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64)]
    lib.nann_hnsw_free.argtypes = [ctypes.c_void_p]
    # optional symbol: a libnann_hnsw.so built before the progress counter
    # landed still loads (rebuild with `make -C native` to get fractions)
    if hasattr(lib, "nann_hnsw_progress"):
        lib.nann_hnsw_progress.argtypes = [ctypes.POINTER(ctypes.c_int64),
                                           ctypes.POINTER(ctypes.c_int64)]
    _lib = lib
    return lib


def build_hnsw(embeddings: np.ndarray, M: int = 32, ef_construction: int = 200,
               seed: int = 42, num_threads: int = 0
               ) -> Tuple[np.ndarray, Dict[int, Tuple[np.ndarray, np.ndarray]]]:
    """Build the HNSW graph over item embeddings.

    Returns:
        levels: [n] int32, each node's top level (0-based)
        csr: {level: (values int32 [nnz], row_splits int64 [n+1])} for every
             level of the graph
    """
    lib = _load_lib()
    emb = np.ascontiguousarray(embeddings, dtype=np.float32)
    n, d = emb.shape
    if num_threads <= 0:
        num_threads = min(os.cpu_count() or 1, 8)
    # heartbeat while the native call runs (ctypes releases the GIL): a
    # multi-M build is silent for ~35 min otherwise, which a log-silence
    # watchdog (scripts/babysit.sh) reads as a hang and kills
    import threading
    import time as _time
    done = threading.Event()

    def _beat():
        t0 = _time.time()
        has_progress = hasattr(lib, "nann_hnsw_progress")
        while not done.wait(120):
            d_done, d_total = ctypes.c_int64(), ctypes.c_int64()
            if has_progress:
                lib.nann_hnsw_progress(ctypes.byref(d_done),
                                       ctypes.byref(d_total))
            el = _time.time() - t0
            if d_total.value > 0 and d_done.value > 0:
                eta = el * (d_total.value - d_done.value) / d_done.value
                logger.info(
                    f"hnsw build running ({d_done.value}/{d_total.value} "
                    f"nodes = {d_done.value / d_total.value:.1%}, "
                    f"{el:.0f}s elapsed, ~{eta:.0f}s left)")
            else:
                logger.info(f"hnsw build running ({n} nodes, "
                            f"{el:.0f}s elapsed)")

    beat = threading.Thread(target=_beat, daemon=True)
    beat.start()
    try:
        handle = lib.nann_hnsw_build(
            emb.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n, d, M, ef_construction, seed, num_threads)
    finally:
        done.set()
        beat.join(timeout=1)
    if not handle:
        raise RuntimeError("nann_hnsw_build failed")
    try:
        max_level = lib.nann_hnsw_max_level(handle)
        levels = np.empty(n, np.int32)
        lib.nann_hnsw_levels(handle,
                             levels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        csr = {}
        for level in range(max_level + 1):
            nnz = lib.nann_hnsw_level_nnz(handle, level)
            values = np.empty(nnz, np.int32)
            row_splits = np.empty(n + 1, np.int64)
            lib.nann_hnsw_level_csr(
                handle, level,
                values.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                row_splits.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
            csr[level] = (values, row_splits)
        return levels, csr
    finally:
        lib.nann_hnsw_free(handle)


def build_and_save_index(embeddings: np.ndarray, start_level: int,
                         num_neighbors: int, output_dir: str,
                         ef_construction: int = 200, seed: int = 42,
                         num_threads: int = 0) -> None:
    """Build + export in the reference artifact contract
    (build_hnsw_index.py:33-67): CSR neighbor arrays for levels below
    `start_level`, and enter_points = nodes with level > start_level."""
    os.makedirs(output_dir, exist_ok=True)
    levels, csr = build_hnsw(embeddings, num_neighbors, ef_construction, seed,
                             num_threads=num_threads)

    # Reference semantics (build_hnsw_index.py:45): faiss's hnsw.levels are
    # 1-based level counts, so `levels > start_level` there selects nodes with
    # 0-based top level >= start_level. Our `levels` are 0-based top levels.
    enter_points = np.nonzero(levels >= start_level)[0].astype(np.int64)
    if enter_points.size == 0:
        # tiny indexes may top out below start_level; fall back to the highest
        # populated level so search still has entry points
        top = levels.max()
        enter_points = np.nonzero(levels >= top)[0].astype(np.int64)
        logger.info(f"no nodes at start_level={start_level}; "
                    f"using {enter_points.size} nodes of level {top}")
    np.save(os.path.join(output_dir, "enter_points.npy"), enter_points)

    n = embeddings.shape[0]
    for level in range(0, start_level):
        if level in csr:
            values, row_splits = csr[level]
        else:
            values = np.zeros(0, np.int32)
            row_splits = np.zeros(n + 1, np.int64)
        np.save(os.path.join(output_dir, f"neighbors_level_{level}_values.npy"),
                values.astype(np.int64))
        np.save(os.path.join(output_dir,
                             f"neighbors_level_{level}_row_splits.npy"),
                row_splits)
    logger.info(f"saved index ({n} nodes, start_level={start_level}, "
                f"{enter_points.size} enter points) to {output_dir}")
