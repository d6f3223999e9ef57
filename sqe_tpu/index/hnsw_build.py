"""Host-side HNSW graph construction (C++ via ctypes, NumPy fallback).

The reference delegated graph construction to OpenSearch's nmslib engine over
HTTP bulk inserts (app/main.py:309-345). Here construction is in-process:

- ``build_graph``     — C++ builder (native/hnsw_builder.cc) compiled on first
  use with g++; classic hierarchical insert, occlusion-pruned neighbors.
- ``insert_batch``    — incremental insertion into an existing flat graph
  (serves the /upload_text ingestion path, embedding_gen.py:196-257).
- ``build_graph_numpy`` — pure-NumPy level-0-only builder used as a fallback
  when no compiler is available and as a cross-check in tests.

Output format (the device contract): ``neighbors0 [N, 2M] int32`` (-1 padded)
plus ``levels [N] int32`` — a flattened fixed-degree neighbor table that
uploads directly to TPU HBM for the batched beam search in hnsw.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_LIB_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_SRC = os.path.join(_NATIVE_DIR, "hnsw_builder.cc")


def _compile_lib() -> Optional[str]:
    so_path = os.path.join(_NATIVE_DIR, "libhnsw_builder.so")
    if os.path.exists(so_path) and os.path.getmtime(so_path) >= os.path.getmtime(_SRC):
        return so_path
    try:
        cmd = [
            "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
            _SRC, "-o", so_path,
        ]
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return so_path
    except Exception:
        return None


def _get_lib() -> Optional[ctypes.CDLL]:
    global _LIB
    with _LIB_LOCK:
        if _LIB is not None:
            return _LIB
        so_path = _compile_lib()
        if so_path is None:
            return None
        lib = ctypes.CDLL(so_path)
        i32p = ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.hnsw_build.restype = ctypes.c_int
        lib.hnsw_build.argtypes = [
            f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            ctypes.c_uint64, i32p, i32p,
        ]
        lib.hnsw_insert_batch.restype = ctypes.c_int
        lib.hnsw_insert_batch.argtypes = [
            f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
            ctypes.c_int, ctypes.c_uint64, i32p, i32p,
        ]
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return _get_lib() is not None


def _as_f32c(x: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(x, dtype=np.float32)


def build_graph(
    vectors: np.ndarray,
    M: int = 16,
    ef_construction: int = 200,
    seed: int = 42,
    force_numpy: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Build the flat level-0 graph for normalized ``vectors [N, D]``.

    Returns (neighbors0 [N, 2M] int32 with -1 padding, levels [N] int32).
    """
    n, d = vectors.shape
    if n == 0:
        return np.zeros((0, 2 * M), np.int32), np.zeros((0,), np.int32)
    lib = None if force_numpy else _get_lib()
    if lib is None:
        return build_graph_numpy(vectors, M=M, ef_construction=ef_construction, seed=seed)
    vecs = _as_f32c(vectors)
    neighbors0 = np.empty((n, 2 * M), dtype=np.int32)
    levels = np.empty((n,), dtype=np.int32)
    rc = lib.hnsw_build(
        vecs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, d, M, ef_construction, seed,
        neighbors0.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        levels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        raise RuntimeError(f"hnsw_build failed with code {rc}")
    return neighbors0, levels


def insert_batch(
    all_vectors: np.ndarray,
    neighbors0: np.ndarray,
    levels: np.ndarray,
    n_old: int,
    M: int = 16,
    ef_construction: int = 200,
    seed: int = 42,
) -> Tuple[np.ndarray, np.ndarray]:
    """Insert rows ``all_vectors[n_old:]`` into an existing flat graph.

    ``neighbors0``/``levels`` describe the first ``n_old`` rows; returns the
    extended (neighbors0, levels) covering all rows.
    """
    n_total, d = all_vectors.shape
    n_new = n_total - n_old
    if n_new <= 0:
        return neighbors0, levels
    lib = _get_lib()
    if lib is None:
        # Fallback: rebuild from scratch with NumPy.
        return build_graph_numpy(all_vectors, M=M, ef_construction=ef_construction, seed=seed)
    vecs = _as_f32c(all_vectors)
    nbrs = np.full((n_total, 2 * M), -1, dtype=np.int32)
    lvls = np.zeros((n_total,), dtype=np.int32)
    if n_old:
        nbrs[:n_old] = neighbors0
        lvls[:n_old] = levels
    rc = lib.hnsw_insert_batch(
        vecs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_old, n_new, d, M, ef_construction, seed,
        nbrs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        lvls.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        raise RuntimeError(f"hnsw_insert_batch failed with code {rc}")
    return nbrs, lvls


def build_graph_numpy(
    vectors: np.ndarray,
    M: int = 16,
    ef_construction: int = 200,
    seed: int = 42,
) -> Tuple[np.ndarray, np.ndarray]:
    """Pure-NumPy flat-graph builder (level 0 only).

    Builds a pruned kNN graph: exact neighbors per node (blocked matmul),
    occlusion pruning to M, then reverse edges up to the 2M cap. Quality is
    comparable to HNSW level 0 for the sizes tests use; the C++ builder is the
    production path.
    """
    rng = np.random.default_rng(seed)
    del rng  # level assignment is irrelevant for the flat export
    n, d = vectors.shape
    m0 = 2 * M
    v = _as_f32c(vectors)
    k = min(n - 1, max(ef_construction // 4, m0))
    block = max(1, min(n, 8192, int(2e8 // max(n, 1))))

    knn = np.empty((n, k), dtype=np.int32)
    knn_sims = np.empty((n, k), dtype=np.float32)
    for start in range(0, n, block):
        stop = min(start + block, n)
        scores = v[start:stop] @ v.T
        scores[np.arange(start, stop) - start, np.arange(start, stop)] = -np.inf
        part = np.argpartition(-scores, k - 1, axis=1)[:, :k]
        ps = np.take_along_axis(scores, part, axis=1)
        order = np.argsort(-ps, axis=1)
        knn[start:stop] = np.take_along_axis(part, order, axis=1)
        knn_sims[start:stop] = np.take_along_axis(ps, order, axis=1)

    neighbors = [list() for _ in range(n)]
    for i in range(n):
        chosen: list[int] = []
        for j_pos in range(k):
            if len(chosen) >= M:
                break
            cand = int(knn[i, j_pos])
            cand_sim = knn_sims[i, j_pos]
            occluded = any(float(v[cand] @ v[s]) > cand_sim for s in chosen)
            if not occluded:
                chosen.append(cand)
        for j_pos in range(k):
            if len(chosen) >= M:
                break
            cand = int(knn[i, j_pos])
            if cand not in chosen:
                chosen.append(cand)
        neighbors[i] = chosen
    # Reverse edges up to cap.
    for i in range(n):
        for nb in list(neighbors[i]):
            if len(neighbors[nb]) < m0 and i not in neighbors[nb]:
                neighbors[nb].append(i)

    out = np.full((n, m0), -1, dtype=np.int32)
    for i, nbrs in enumerate(neighbors):
        out[i, : min(len(nbrs), m0)] = nbrs[:m0]
    levels = np.zeros((n,), dtype=np.int32)
    return out, levels
