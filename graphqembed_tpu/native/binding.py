"""ctypes binding + build for the native C++ bulk sampler.

The .so is compiled on demand with g++ (no pybind11 on this image; plain C ABI
+ ctypes per the environment constraints) and cached next to the source. If
the toolchain is unavailable the python sampler (data/sampling.py) remains the
fallback — same semantics, cross-checked by tests.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

from graphqembed_tpu.config import STRUCTURES
from graphqembed_tpu.data.queries import Formula, Query
from graphqembed_tpu.graph.graph import Graph

_DIR = Path(__file__).resolve().parent
_SO = _DIR / "libgqe_sampler.so"
_LIB = None


def _build() -> bool:
    src = _DIR / "sampler.cpp"
    if _SO.exists() and _SO.stat().st_mtime >= src.stat().st_mtime:
        return True
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             str(src), "-o", str(_SO)],
            check=True, capture_output=True, text=True, timeout=300)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not _build():
        return None
    lib = ctypes.CDLL(str(_SO))
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.gqe_sample_queries.restype = ctypes.c_int
    lib.gqe_sample_queries.argtypes = [
        ctypes.c_int, i32p, i32p,                      # modes
        ctypes.c_int, i32p, i32p, i32p, i64p, i64p, i32p, i32p,  # rels+CSR
        ctypes.c_int, ctypes.c_int, ctypes.c_uint64,   # structure, n, seed
        ctypes.c_int, ctypes.c_int, ctypes.c_int,      # max_negs, tries, exh
        i32p, i32p, i32p, i32p, i32p, i32p, i32p,      # outputs
    ]
    lib.gqe_sample_clean_queries.restype = ctypes.c_int
    lib.gqe_sample_clean_queries.argtypes = [
        ctypes.c_int, i32p, i32p,                      # modes
        ctypes.c_int, i32p, i32p, i32p, i64p, i64p, i32p, i32p,  # rels+CSR
        i64p, i64p, i32p, i32p,                        # TRAIN CSR
        ctypes.c_int, ctypes.c_int, ctypes.c_uint64,   # structure, n, seed
        ctypes.c_int, ctypes.c_int, ctypes.c_int,      # max_negs, tries, exh
        i32p, i32p, i32p, i32p, i32p, i32p, i32p,      # outputs
    ]
    lib.gqe_all_edges_1p.restype = ctypes.c_int
    lib.gqe_all_edges_1p.argtypes = [
        ctypes.c_int, i32p, i32p,                      # modes
        ctypes.c_int, i32p, i32p, i32p, i64p, i64p, i32p, i32p,  # rels+CSR
        ctypes.c_int64, ctypes.c_uint64, ctypes.c_int,  # cap, seed, max_negs
        ctypes.c_int,                                   # n_threads
        i32p, i32p, i32p, i32p, i32p,                  # outputs
    ]
    _LIB = lib
    return lib


def native_available() -> bool:
    return _load() is not None


class _GraphArrays:
    """Flattened CSR encoding of a Graph for the C ABI (cached per graph)."""

    def __init__(self, graph: Graph):
        schema = graph.schema
        self.schema = schema
        self.mode_lo = np.array(
            [schema.mode_range(m)[0] for m in schema.modes], np.int32)
        self.mode_hi = np.array(
            [schema.mode_range(m)[1] for m in schema.modes], np.int32)
        self.rel_from = np.array(
            [schema.mode_id(r[0]) for r in schema.relations], np.int32)
        self.rel_to = np.array(
            [schema.mode_id(r[2]) for r in schema.relations], np.int32)
        self.rel_rev = np.array(
            [schema.reverse_rel_id(i) for i in range(schema.n_relations)],
            np.int32)
        indptrs, indices = [], []
        ip_off, ix_off = [], []
        for r in schema.relations:
            ip, ix = graph.csr(r)
            ip_off.append(sum(len(x) for x in indptrs))
            ix_off.append(sum(len(x) for x in indices))
            indptrs.append(ip.astype(np.int32))
            indices.append(ix.astype(np.int32))
        self.indptr_off = np.array(ip_off, np.int64)
        self.indices_off = np.array(ix_off, np.int64)
        self.indptr_cat = np.concatenate(indptrs).astype(np.int32)
        self.indices_cat = (np.concatenate(indices).astype(np.int32)
                            if any(len(x) for x in indices)
                            else np.zeros(1, np.int32))


def _graph_arrays(graph: Graph) -> "_GraphArrays":
    ga = getattr(graph, "_native_arrays", None)
    if ga is None:
        ga = _GraphArrays(graph)
        graph._native_arrays = ga
    return ga


def native_sample_arrays(graph: Graph, structure: str, n: int, seed: int = 0,
                         max_negs: int = 100, exhaustive_negs: bool = False,
                         max_tries: int = 200):
    """Raw-array variant for bulk pipelines (feeds DevicePool directly, no
    python Query objects): returns dict of numpy arrays truncated to the
    sampled count, or None if the native library is unavailable. The GIL is
    released during the C call, so thread-parallel invocations scale."""
    lib = _load()
    if lib is None:
        return None
    ga = _graph_arrays(graph)
    schema = graph.schema
    if exhaustive_negs:
        tmodes = {f[2] for f in schema.relations}
        max_negs = max(schema.mode_counts[m] for m in tmodes)
    si = STRUCTURES.index(structure)
    out_rels = np.empty((n, 3), np.int32)
    out_anchors = np.empty((n, 3), np.int32)
    out_targets = np.empty(n, np.int32)
    out_negs = np.empty((n, max_negs), np.int32)
    out_negc = np.empty(n, np.int32)
    out_hard = np.empty((n, max_negs), np.int32)
    out_hardc = np.empty(n, np.int32)
    got = lib.gqe_sample_queries(
        len(schema.modes), ga.mode_lo, ga.mode_hi,
        schema.n_relations, ga.rel_from, ga.rel_to, ga.rel_rev,
        ga.indptr_off, ga.indices_off, ga.indptr_cat, ga.indices_cat,
        si, n, seed, max_negs, max_tries, int(exhaustive_negs),
        out_rels, out_anchors, out_targets, out_negs, out_negc, out_hard,
        out_hardc)
    return {
        "structure": structure,
        "rels": out_rels[:got],
        "anchors": out_anchors[:got],
        "targets": out_targets[:got],
        "negs": out_negs[:got],
        "neg_counts": out_negc[:got],
        "hard": out_hard[:got],
        "hard_counts": out_hardc[:got],
    }


def native_sample_clean_arrays(graph: Graph, train_graph: Graph,
                               structure: str, n: int, seed: int = 0,
                               max_negs: int = 100,
                               exhaustive_negs: bool = False,
                               max_tries: int = 200):
    """Clean-test sampling at native speed (SURVEY §2.1): walks the FULL
    graph, keeps only queries unanswerable on `train_graph` (>=1 held-out
    edge required), negatives/hard negatives computed on the full graph —
    the C++ twin of QuerySampler.sample(train_graph=...). Returns the
    native_sample_arrays dict, or None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    ga = _graph_arrays(graph)
    ta = _graph_arrays(train_graph)
    schema = graph.schema
    if exhaustive_negs:
        tmodes = {f[2] for f in schema.relations}
        max_negs = max(schema.mode_counts[m] for m in tmodes)
    si = STRUCTURES.index(structure)
    out_rels = np.empty((n, 3), np.int32)
    out_anchors = np.empty((n, 3), np.int32)
    out_targets = np.empty(n, np.int32)
    out_negs = np.empty((n, max_negs), np.int32)
    out_negc = np.empty(n, np.int32)
    out_hard = np.empty((n, max_negs), np.int32)
    out_hardc = np.empty(n, np.int32)
    got = lib.gqe_sample_clean_queries(
        len(schema.modes), ga.mode_lo, ga.mode_hi,
        schema.n_relations, ga.rel_from, ga.rel_to, ga.rel_rev,
        ga.indptr_off, ga.indices_off, ga.indptr_cat, ga.indices_cat,
        ta.indptr_off, ta.indices_off, ta.indptr_cat, ta.indices_cat,
        si, n, seed, max_negs, max_tries, int(exhaustive_negs),
        out_rels, out_anchors, out_targets, out_negs, out_negc, out_hard,
        out_hardc)
    return {
        "structure": structure,
        "rels": out_rels[:got],
        "anchors": out_anchors[:got],
        "targets": out_targets[:got],
        "negs": out_negs[:got],
        "neg_counts": out_negc[:got],
        "hard": out_hard[:got],
        "hard_counts": out_hardc[:got],
    }


def native_all_edges_1p(graph: Graph, cap: int | None = None, seed: int = 0,
                        max_negs: int = 16, n_threads: int | None = None):
    """EVERY edge as a 1p query with exact negatives (C++, one pass over the
    CSR) — the full-coverage 1p pool (the reference's train_edges IS the edge
    set). If the graph has more than `cap` edges, a uniform ~cap subsample is
    taken. Returns a native_sample_arrays-format dict (no hard pools — 1p has
    none), or None if the native library is unavailable.

    Full-coverage builds (cap >= n_edges) run on `n_threads` C++ threads
    (default: all cores; GIL released) writing disjoint output slices —
    this call was 73% of paper-scale preprocessing wall-clock when
    sequential. Deterministic for a fixed (seed, n_threads)."""
    import os

    lib = _load()
    if lib is None:
        return None
    ga = _graph_arrays(graph)
    schema = graph.schema
    n_edges = graph.num_edges()
    cap = int(min(cap or n_edges, n_edges))
    out_rels = np.full((cap, 3), -1, np.int32)
    out_anchors = np.full((cap, 3), -1, np.int32)
    out_targets = np.empty(cap, np.int32)
    out_negs = np.empty((cap, max_negs), np.int32)
    out_negc = np.empty(cap, np.int32)
    got = lib.gqe_all_edges_1p(
        len(schema.modes), ga.mode_lo, ga.mode_hi,
        schema.n_relations, ga.rel_from, ga.rel_to, ga.rel_rev,
        ga.indptr_off, ga.indices_off, ga.indptr_cat, ga.indices_cat,
        cap, seed, max_negs, int(n_threads or os.cpu_count() or 1),
        out_rels, out_anchors, out_targets, out_negs, out_negc)
    z = np.zeros((got, max_negs), np.int32)
    return {
        "structure": "1p",
        "rels": out_rels[:got],
        "anchors": out_anchors[:got],
        "targets": out_targets[:got],
        "negs": out_negs[:got],
        "neg_counts": out_negc[:got],
        "hard": z,
        "hard_counts": np.zeros(got, np.int32),
    }


def _arrays_to_queries(schema, structure: str, arrays: dict) -> list[Query]:
    """native_sample_arrays dict -> Query objects (sorted negative pools,
    reference-style)."""
    queries: list[Query] = []
    negc = arrays["neg_counts"]
    hardc = arrays["hard_counts"]
    for i in range(len(arrays["targets"])):
        rels = tuple(schema.rel_of(int(r)) for r in arrays["rels"][i]
                     if r >= 0)
        anchors = tuple(int(a) for a in arrays["anchors"][i] if a >= 0)
        hard = None
        if hardc[i] > 0:
            hard = np.sort(arrays["hard"][i, :hardc[i]].astype(np.int64))
        queries.append(Query(
            Formula(structure, rels), anchors, int(arrays["targets"][i]),
            np.sort(arrays["negs"][i, :negc[i]].astype(np.int64)), hard))
    return queries


def native_sample_many(graph: Graph, structure: str, n: int, seed: int = 0,
                       max_negs: int = 100, exhaustive_negs: bool = False,
                       max_tries: int = 200) -> list[Query] | None:
    """C++ bulk sampler; returns None if the native library is unavailable.
    Same semantics as QuerySampler.sample_many (invariant-tested, not
    bit-identical: different RNG streams)."""
    arrays = native_sample_arrays(graph, structure, n, seed=seed,
                                  max_negs=max_negs,
                                  exhaustive_negs=exhaustive_negs,
                                  max_tries=max_tries)
    if arrays is None:
        return None
    return _arrays_to_queries(graph.schema, structure, arrays)


def native_sample_clean_many(graph: Graph, train_graph: Graph,
                             structure: str, n: int, seed: int = 0,
                             max_negs: int = 100,
                             exhaustive_negs: bool = False,
                             max_tries: int = 200) -> list[Query] | None:
    """C++ clean-test sampler (see native_sample_clean_arrays): Query
    objects whose answers REQUIRE a held-out edge. The python twin is
    QuerySampler.sample_many(train_graph=...)."""
    arrays = native_sample_clean_arrays(graph, train_graph, structure, n,
                                        seed=seed, max_negs=max_negs,
                                        exhaustive_negs=exhaustive_negs,
                                        max_tries=max_tries)
    if arrays is None:
        return None
    return _arrays_to_queries(graph.schema, structure, arrays)
