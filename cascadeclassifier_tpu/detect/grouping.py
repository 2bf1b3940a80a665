"""Exact replication of OpenCV groupRectangles (minNeighbors grouping).

The reference detection samples rely on OpenCV's
``detectMultiScale(..., minNeighbors)`` post-processing
(tools/detection/Cpp/main.cpp:45); this module reproduces
``cv::groupRectangles(rectList, groupThreshold, eps)`` semantics:

  - partition rects into connected components under the SimilarRects
    predicate (|Δ| ≤ eps · 0.5 · (min(w1,w2) + min(h1,h2)) on all 4 sides)
  - average each class (cvRound = round-half-even)
  - keep classes with count > groupThreshold, dropping small clusters
    contained in bigger ones
"""

from __future__ import annotations

import numpy as np


def _cv_round(v):
    return int(np.rint(v))


def clip_rects(rects, img_w: int, img_h: int):
    """Clip rects to the image, dropping empty intersections.

    Replicates OpenCV's clipObjects (cascadedetect.cpp), which
    detectMultiScale applies AFTER groupRectangles — candidate windows at
    the last pyramid level can overhang the image by a pixel (cvRound of
    position × scale), and the overhanging height takes part in the
    cluster average BEFORE the clip."""
    rects = np.asarray(rects, np.int32).reshape(-1, 4)
    if len(rects) == 0:
        return rects
    x = np.maximum(rects[:, 0], 0)
    y = np.maximum(rects[:, 1], 0)
    w = np.minimum(rects[:, 0] + rects[:, 2], img_w) - x
    h = np.minimum(rects[:, 1] + rects[:, 3], img_h) - y
    keep = (w > 0) & (h > 0)
    return np.stack([x, y, w, h], axis=1)[keep]


def _native_group(rects, group_threshold, eps):
    """Dispatch to the C++ grouping (csrc/) when available; None otherwise."""
    try:
        import ctypes

        from cascadeclassifier_tpu.data.native import get_lib

        lib = get_lib()
        if lib is None:
            return None
        if not hasattr(lib, "_group_ready"):
            lib.cctpu_group_rectangles.restype = ctypes.c_int
            lib.cctpu_group_rectangles.argtypes = [
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_double,
                ctypes.POINTER(ctypes.c_int32),
            ]
            lib._group_ready = True
        rin = np.ascontiguousarray(rects, np.int32)
        out = np.empty_like(rin)
        m = lib.cctpu_group_rectangles(
            rin.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(rin),
            group_threshold,
            eps,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return out[:m].copy()
    except Exception:
        return None


def group_rectangles(rects, group_threshold: int, eps: float = 0.2):
    """rects: (N, 4) int array-like of (x, y, w, h). Returns (M, 4) int32.

    Matches cv::groupRectangles(objects, minNeighbors, 0.2) as called by
    detectMultiScale. group_threshold <= 0 returns the input unchanged.
    Dispatches to the native C++ implementation (csrc/) for large inputs;
    the Python union-find below is the portable reference."""
    rects = np.asarray(rects, np.int64).reshape(-1, 4)
    if group_threshold <= 0 or len(rects) == 0:
        return rects.astype(np.int32)

    if len(rects) > 64:
        nat = _native_group(rects, group_threshold, eps)
        if nat is not None:
            return nat

    n = len(rects)
    # connected components of the similarity graph (transitive closure,
    # like cv::partition); the SimilarRects predicate is evaluated for
    # all pairs at once in numpy. Dense clusters produce O(n^2) edges, so
    # the closure runs through scipy's compiled connected_components (a
    # Python union-find over edges costs >60 s at n=4000)
    x, y, w, h = rects.T
    delta = eps * 0.5 * (np.minimum.outer(w, w) + np.minimum.outer(h, h))
    sim = (
        (np.abs(np.subtract.outer(x, x)) <= delta)
        & (np.abs(np.subtract.outer(y, y)) <= delta)
        & (np.abs(np.subtract.outer(x + w, x + w)) <= delta)
        & (np.abs(np.subtract.outer(y + h, y + h)) <= delta)
    )
    try:
        from scipy.sparse import csr_matrix
        from scipy.sparse.csgraph import connected_components

        _, roots = connected_components(csr_matrix(sim), directed=False)
    except ImportError:  # pragma: no cover — scipy is baked in
        parent = np.arange(n)

        def find(a):
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        for i, j in zip(*np.nonzero(np.triu(sim, 1))):
            ri, rj = find(i), find(j)
            if ri != rj:
                parent[rj] = ri
        roots = np.array([find(i) for i in range(n)])
    classes = {}
    for i, r in enumerate(roots):
        classes.setdefault(r, []).append(i)

    rrects = []
    rweights = []
    for members in classes.values():
        cnt = len(members)
        # OpenCV averages with float s = 1.f/n and FLOAT products
        # (cascadedetect.cpp groupRectangles) — replicate the
        # single-precision arithmetic for byte parity
        s = np.float32(1.0) / np.float32(cnt)
        acc = rects[members].sum(axis=0).astype(np.float32)
        rrects.append(
            (
                _cv_round(acc[0] * s),
                _cv_round(acc[1] * s),
                _cv_round(acc[2] * s),
                _cv_round(acc[3] * s),
            )
        )
        rweights.append(cnt)

    out = []
    nclasses = len(rrects)
    for i in range(nclasses):
        r1, n1 = rrects[i], rweights[i]
        if n1 <= group_threshold:
            continue
        contained = False
        for j in range(nclasses):
            n2 = rweights[j]
            if j == i or n2 <= group_threshold:
                continue
            r2 = rrects[j]
            dx = _cv_round(r2[2] * eps)
            dy = _cv_round(r2[3] * eps)
            if (
                r1[0] >= r2[0] - dx
                and r1[1] >= r2[1] - dy
                and r1[0] + r1[2] <= r2[0] + r2[2] + dx
                and r1[1] + r1[3] <= r2[1] + r2[3] + dy
                and (n2 > max(3, n1) or n1 < 3)
            ):
                contained = True
                break
        if not contained:
            out.append(r1)
    return np.array(out, np.int32).reshape(-1, 4)
