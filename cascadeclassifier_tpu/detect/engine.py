"""Single-dispatch fused detection engine.

The compact engine (detect/detector.py::_run_compact) is orchestrated from
the host: one program per dense stage plus a survivor-count fetch between
stages. Over the TPU tunnel a host round trip costs ~28 ms — more than the
arithmetic of the entire cascade — so this engine compiles the WHOLE
detection pipeline into one XLA program per frame geometry:

  canvas (MXU resize + integral)
  → variance gate ∧ static visit grid (the ystep/row-bound superset of
    windows the OpenCV walk can ever visit — ~4x fewer positions than the
    dense canvas)
  → dense stage 0 → closed-form visited mask (the serial x-walk
    skip-after-reject recurrence solved with prefix ops, see
    parity_visited) → dense stages 1..K-1
  → fixed-size survivor extraction (MXU-rank nonzero) → patch DMA
    (pallas) → MXU limb-matmul tail over stages K.. → scatter-back
  → fixed-size detection extraction

One dispatch, one result fetch per frame; the bench pipelines dispatches
across frames so the tunnel latency amortizes away. Survivor and
detection counts are bounded by static shapes (tail_n / max_det) with
device-computed overflow flags — the host re-runs the rare overflow frame
through the adaptive compact engine instead of paying a mid-pipeline sync
on every frame.

Replaces cv::CascadeClassifier::detectMultiScale (reference
tools/detection/Cpp/main.cpp:42-49); byte-parity with the C++ runtime is
asserted by tests/test_detector.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from cascadeclassifier_tpu.detect.compact import (
    make_nonzero_fn,
    make_pallas_patchify,
    make_patchify_fn,
    make_tail_fn,
    pad_canvas_for_patchify,
)
from cascadeclassifier_tpu.detect.dense import (
    dense_stage_haar,
    dense_variance_gate,
)


def static_visit_grid(plan) -> np.ndarray:
    """(out_h, out_w) bool — the superset of window positions the OpenCV
    x-walk can visit: grid rows (ystep-aware), columns within the level
    bound, even columns where ystep == 2 (dense_walk_visited's `on`)."""
    out_h = plan.canvas_h - plan.win_h
    out_w = plan.canvas_w - plan.win_w
    cols = np.arange(out_w)
    on = (
        plan.row_is_grid[:out_h, None]
        & (cols[None, :] <= plan.row_maxc[:out_h, None])
        & (~plan.row_step2[:out_h, None] | ((cols[None, :] & 1) == 0))
    )
    return on


def parity_visited(m0, on, ordinal=None):
    """Closed-form dense_walk_visited (detect/dense.py:163-185).

    Per row, over its sequence of `on` columns c_1 < c_2 < …, the walk
    recurrence is v_k = ¬(v_{k−1} ∧ m0[c_{k−1}]), v_1 = True: inside a
    run of consecutive skip-triggering columns v alternates, and any
    non-triggering column resets it. Hence
        v_k = even(k − lastFalse_k − 1)
    with lastFalse_k the ordinal of the last on-column before k where the
    skip trigger (m0) was False. Both terms are prefix ops along the
    column axis — fully parallel, unlike the 1900-step lax.scan.

    ordinal: optional host-precomputed inclusive cumsum of `on` (it is a
    compile-time constant; folding it in XLA is pathologically slow)."""
    onw = on
    if ordinal is None:
        ordinal = jnp.cumsum(
            jnp.asarray(onw).astype(jnp.int32), axis=1
        )  # inclusive k
    marker = jnp.where(onw & (~m0), ordinal, 0)
    # exclusive prefix max over columns (log-step scan: reduce-window
    # lowering of cummax is O(n·w) on some backends)
    lastf = jax.lax.associative_scan(jnp.maximum, marker, axis=1)
    lastf = jnp.concatenate(
        [jnp.zeros((marker.shape[0], 1), marker.dtype), lastf[:, :-1]],
        axis=1,
    )
    return onw & (((ordinal - lastf - 1) & 1) == 0)


class FusedEngine:
    """Builds one jitted program per (plan, params) running the entire
    multiscale detection for stump Haar cascades without tilted features.

    n_front: number of stages evaluated densely before survivor
    compaction. tail_n: static survivor capacity of the MXU tail (the
    program reports overflow instead of dropping windows)."""

    def __init__(self, packed, exact: bool = False, n_front: int = 6,
                 tail_n: int = 1 << 16, interpret: bool = False):
        from cascadeclassifier_tpu.models.model import FEATURE_HAAR

        if packed.feature_type != FEATURE_HAAR or packed.has_tilted or any(
            st.deep_trees is not None for st in packed.stages
        ):
            raise ValueError("fused engine supports stump Haar cascades "
                             "without tilted features")
        self.packed = packed
        self.exact = exact
        self.n_front = min(n_front, len(packed.stages))
        self.tail_n = tail_n
        self.interpret = interpret
        self._programs = {}

    def program(self, plan, max_det: int):
        key = (plan.canvas_h, plan.canvas_w, max_det)
        if key not in self._programs:
            self._programs[key] = self._build(plan, max_det)
        return self._programs[key]

    # Trees per dense-front program: one mega-program at 1080p makes the
    # XLA scheduler crawl (>20 min compiles); chunks of ~80 trees compile
    # in seconds and chain as async dispatches with zero host syncs.
    FRONT_CHUNK = 80

    def _build(self, plan, max_det: int):
        from cascadeclassifier_tpu.detect.detector import (
            _build_canvas,
            _resize_matrices,
        )

        packed = self.packed
        exact = self.exact
        out_h = plan.canvas_h - packed.win_h
        out_w = plan.canvas_w - packed.win_w
        img_w, img_h = plan.img_w, plan.img_h
        resize_mats = _resize_matrices(plan)
        grid_np = static_visit_grid(plan)
        grid = jnp.asarray(grid_np)
        ordinal = jnp.asarray(np.cumsum(grid_np, axis=1, dtype=np.int32))
        n_front = self.n_front
        n_stages = len(packed.stages)
        tail_n = max(
            32,
            min(
                self.tail_n,
                1 << int(np.ceil(np.log2(max(out_h * out_w, 2)))),
            ),
        )

        nonzero_tail = make_nonzero_fn(out_h, out_w, tail_n)
        nonzero_det = make_nonzero_fn(out_h, out_w, max_det)
        tail_fn = None
        if n_front < n_stages:
            tail_fn = make_tail_fn(packed, n_front, exact)
        use_pallas = jax.default_backend() == "tpu" and not self.interpret
        if n_front < n_stages:
            if use_pallas:
                ppatch, _ = make_pallas_patchify(
                    packed.win_w, packed.win_h,
                    plan.canvas_h, plan.canvas_w, tail_n,
                )
            else:
                xpatch = make_patchify_fn(packed.win_w, packed.win_h, False)

        def stage_pass(sum2d, inv_nf, si):
            st = packed.stages[si]
            ssum = dense_stage_haar(
                sum2d, sum2d, st, out_h, out_w, inv_nf, exact=exact
            )
            if exact:
                with jax.enable_x64(True):
                    return ssum >= jnp.float64(st.threshold)
            return ssum >= jnp.float32(st.threshold)

        def head(img, tab):
            """Canvas + gate + stage 0 + the serial-walk visited mask."""
            sum2d, sq2d, _ = _build_canvas(
                img, tab, img_w, img_h, need_sq=True,
                resize_mats=resize_mats,
            )
            gate, inv_nf = dense_variance_gate(
                sum2d, sq2d, packed.win_w, packed.win_h, out_h, out_w
            )
            passed0 = stage_pass(sum2d, inv_nf, 0)
            m0 = gate & (~passed0)
            visited = parity_visited(m0, grid, ordinal)
            alive = gate & grid & passed0 & visited
            return sum2d, inv_nf, alive

        # dense front chunks of ≤ FRONT_CHUNK trees
        chunks = []
        cur, budget = [], 0
        for si in range(1, n_front):
            cur.append(si)
            budget += packed.stages[si].ntrees
            if budget >= self.FRONT_CHUNK:
                chunks.append(cur)
                cur, budget = [], 0
        if cur:
            chunks.append(cur)

        def make_front(stage_ids):
            def front(sum2d, inv_nf, alive):
                for si in stage_ids:
                    alive = alive & stage_pass(sum2d, inv_nf, si)
                    alive = jax.lax.optimization_barrier(alive)
                return alive

            return front

        def compact_collect(sum2d, inv_nf, alive):
            """Survivor extraction, MXU tail, detection collection."""
            cnt = jnp.sum(alive, dtype=jnp.int32)
            if n_front < n_stages:
                idx = nonzero_tail(alive)
                r = (idx // out_w).astype(jnp.int32)
                c = (idx % out_w).astype(jnp.int32)
                if use_pallas:
                    ps = ppatch(
                        pad_canvas_for_patchify(sum2d, packed.win_h), r, c
                    )
                    pt = ps[:, :1]
                else:
                    ps, pt = xpatch(sum2d, sum2d, r, c)
                valid = jnp.arange(tail_n) < cnt
                t_alive = tail_fn(ps, pt, inv_nf.reshape(-1)[idx]) & valid
                alive = (
                    jnp.zeros(out_h * out_w, jnp.int8)
                    .at[idx]
                    .max(t_alive.astype(jnp.int8))
                    .reshape(out_h, out_w)
                    != 0
                )
            fcnt = jnp.sum(alive, dtype=jnp.int32)
            fidx = nonzero_det(alive)
            return fidx, fcnt, cnt

        return (
            jax.jit(head),
            [jax.jit(make_front(ids)) for ids in chunks],
            jax.jit(compact_collect),
        )

    # -- host-side driver ---------------------------------------------------

    def detect_async(self, plan, tab, img, max_det: int):
        """Submit one frame (a few chained async dispatches, no syncs);
        returns device arrays (fidx, fcnt, tail_cnt)."""
        head, fronts, tail = self.program(plan, max_det)
        sum2d, inv_nf, alive = head(jnp.asarray(img), tab)
        for f in fronts:
            alive = f(sum2d, inv_nf, alive)
        return tail(sum2d, inv_nf, alive)

    def finish(self, out, max_det: int):
        """(fidx, fcnt, tail_cnt) device triple → flat window indices.

        Raises OverflowError when the static tail capacity was exceeded
        (caller should fall back to the adaptive compact engine)."""
        fidx, fcnt, cnt = (np.asarray(x) for x in out)
        if int(cnt) > self.tail_n:
            raise OverflowError(
                f"{int(cnt)} front survivors exceed tail_n={self.tail_n}"
            )
        if int(fcnt) > max_det:
            raise RuntimeError(
                f"{int(fcnt)} raw detections exceed max_det={max_det}"
            )
        return fidx[: int(fcnt)]
