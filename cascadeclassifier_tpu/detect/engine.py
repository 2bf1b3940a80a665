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

import jax
import jax.numpy as jnp
import numpy as np

from cascadeclassifier_tpu.detect.compact import (
    make_lbp_tail_compact_fn,
    make_nonzero_fn,
    make_pallas_patchify,
    make_patchify_fn,
    make_sparse_nonzero_fn,
    make_tail_compact_fn,
    pad_canvas_for_patchify,
)
from cascadeclassifier_tpu.detect.dense import (
    dense_stage_deep,
    dense_stage_haar,
    dense_stage_lbp,
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


def parity_visited(m0, on, ordinal=None, reset=None):
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
    compile-time constant; folding it in XLA is pathologically slow).

    reset: optional (H, W) bool — columns that hard-reset the walk (the
    OpenCV walk runs per level; shelf-packed plans place several band
    levels on one canvas row, so the gap columns between levels must
    restart the recurrence exactly as a fresh row would). A reset column
    at inclusive ordinal k forces lastFalse = k for everything after it;
    gap columns carry the ordinal of the previous on-column, which is
    precisely the value that makes the next on-column's v_k True."""
    onw = on
    if ordinal is None:
        ordinal = jnp.cumsum(
            jnp.asarray(onw).astype(jnp.int32), axis=1
        )  # inclusive k
    marker = jnp.where(onw & (~m0), ordinal, 0)
    if reset is not None:
        marker = jnp.maximum(marker, jnp.where(reset, ordinal, 0))
    # exclusive prefix max over columns (log-step scan: reduce-window
    # lowering of cummax is O(n·w) on some backends)
    lastf = jax.lax.associative_scan(jnp.maximum, marker, axis=1)
    lastf = jnp.concatenate(
        [jnp.zeros((marker.shape[0], 1), marker.dtype), lastf[:, :-1]],
        axis=1,
    )
    return onw & (((ordinal - lastf - 1) & 1) == 0)


class FusedEngine:
    """Builds the chained per-(plan, params) programs running the entire
    multiscale detection for Haar and LBP cascades (tilted and deep-tree
    included; deep cascades run every stage dense).

    n_front: number of stages evaluated densely before survivor
    compaction. tail_n: static survivor capacity of the MXU tail (the
    program reports overflow instead of dropping windows)."""

    def __init__(self, packed, exact: bool = False, n_front: int = 6,
                 tail_n: int = 1 << 17, interpret: bool = False):
        from cascadeclassifier_tpu.models.model import (
            FEATURE_HAAR,
            FEATURE_LBP,
        )

        if packed.feature_type not in (FEATURE_HAAR, FEATURE_LBP):
            raise ValueError("fused engine supports Haar/LBP cascades")
        self.is_haar = packed.feature_type == FEATURE_HAAR
        self.packed = packed
        self.exact = exact
        self.n_front = min(n_front, len(packed.stages))
        self.tail_n = tail_n
        self.interpret = interpret
        import os

        # frames per vmapped head dispatch (see BATCH_F class comment);
        # default 1: with the static Pallas front the chained programs
        # run 10-40 ms each, so dispatch amortization no longer matters,
        # and the vmapped head programs measured ~20% SLOWER per frame
        # than the per-frame programs (batched canvas 14.6 vs 9.9 ms,
        # psplit 5.0 vs 4.4 — worse XLA layouts under the frame axis)
        self.BATCH_F = int(os.environ.get("CCTPU_BATCH_F", "1"))
        self._programs = {}

    def _static_front_ok(self):
        """True when _build will run the statically-unrolled Pallas front
        (the conditions of use_static_front that do not depend on the
        plan). Drives the plan-layout choice in TPUDetector."""
        import os

        use_pallas = jax.default_backend() == "tpu" and not self.interpret
        deep_any = any(
            st.deep_trees is not None for st in self.packed.stages
        )
        return (
            (use_pallas or self.interpret)
            and self.is_haar
            and not self.exact
            and not (self.is_haar and self.packed.has_tilted)
            and not deep_any
            and os.environ.get("CCTPU_STATIC_FRONT", "1") != "0"
        )

    def wants_packed_plan(self):
        """Shelf-packed band layout (pyramid.py pack_band): enabled for
        the static-front configuration (its head/front/tail consume the
        2D grid tables); the XLA-front paths keep the row-table layout.
        CCTPU_PACK_BAND=0 forces the plain vertical stack."""
        import os

        return (
            self._static_front_ok()
            and os.environ.get("CCTPU_PACK_BAND", "1") != "0"
        )

    def program(self, plan, max_det: int):
        key = (plan.canvas_h, plan.canvas_w, max_det, plan.packed)
        if key not in self._programs:
            progs, fronts, tail, (R, Cs) = self._build(plan, max_det)
            # resident on device ONCE — numpy jit arguments would be
            # re-transferred on every frame (multi-MB over the tunnel)
            consts = (jnp.asarray(R), [jnp.asarray(c) for c in Cs])
            self._programs[key] = (progs, fronts, tail, consts)
        return self._programs[key]

    # Trees per dense-front program: one mega-program at 1080p makes the
    # XLA scheduler crawl (>20 min compiles); chunks of ~80 trees compile
    # in seconds and chain as async dispatches with zero host syncs.
    FRONT_CHUNK = 80
    # Trees per static-Pallas kernel (Mosaic compile time scales with the
    # unrolled tree count; chunking bounds it while the per-tile dead-skip
    # still shortcuts whole chunks for tiles whose survivors are gone)
    STATIC_CHUNK = 250
    # static Pallas front tile geometry. Swept on-chip at 1080p
    # (2026-08-18, adversarial bench frames, whole-pipeline ms/frame):
    # 128x512 = 63.3, 256x512 = 63.7 (but 401 s Mosaic compile vs 169),
    # 64x512 = 65.7, 32x512 = 68.2, 32x1024 = 71.6, 64x256 = 69.5,
    # 16x512 = 80.6 — finer tiles track survivor clustering better in
    # principle (the TPU shape of the reference's per-window early
    # exit) but per-tile overhead wins at bench survivor density
    TILE_H = 128
    TILE_W = 512
    # mid-front re-compaction plan: "budget:tile_h[,budget:tile_h...]" —
    # stages 1.. are assigned to entries by cumulative tree budget and
    # each entry's kernels run at its OWN tile height. A uniform tile
    # must stay coarse (per-tile overhead, sweep above), but after ~3
    # stages ~85% of windows are dead and CLUSTERED, so finer tiles let
    # the per-tile dead-skip drop whole regions (the TPU shape of the
    # reference's per-window early exit at block granularity). Masks are
    # re-fit between geometries by cheap slice/pad programs.
    # CCTPU_FRONT_PLAN overrides for sweeps.
    FRONT_PLAN = "999:128"
    # live-row capacity of the final sparse detection extraction
    K_ROWS = 512
    # trees evaluated densely by the static-Pallas front before cutting
    # over to the sparse MXU tail: by then the survivor count has
    # collapsed and per-window tail matmuls beat dense VPU passes over
    # mostly-dead tiles; ~one STATIC_CHUNK keeps the front one kernel
    STATIC_FRONT_TREES = 250

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
        # resize matrices ride as ARGUMENTS (held in self._consts and
        # device_put once): multi-MB literals baked into the HLO make the
        # remote compile pathologically slow
        R_c, cols_c = _resize_matrices(plan)
        col_meta = tuple(
            (t, bt, bl, h, w) for (t, bt, bl, h, w, _c) in cols_c
        )
        consts = (R_c, [c for (*_m, c) in cols_c])
        n_front = self.n_front
        n_stages = len(packed.stages)

        is_haar = self.is_haar
        tilted = is_haar and packed.has_tilted
        deep_any = any(st.deep_trees is not None for st in packed.stages)
        # survivors only ever sit on ystep grid rows — the per-row sorts
        # inside nonzero run on the compressed row set (~half the canvas)
        grid_rows = np.nonzero(plan.row_is_grid[:out_h])[0].astype(np.int32)
        use_pallas = jax.default_backend() == "tpu" and not self.interpret
        # statically-unrolled Pallas path (detect/pallas_front.py): rect
        # geometry is baked into the kernels and the WHOLE cascade runs
        # densely in fine-tiled VPU kernels whose per-tile dead-skip
        # tracks survivor clustering — no patchify / MXU tail / static
        # tail capacity at all. f32 untilted stump-Haar only (bit-identical
        # to the XLA front); exact-f64, LBP, tilted and deep-tree cascades
        # keep the XLA front (+ MXU tail where the tail can pack them).
        import os

        use_static_front = (
            (use_pallas or self.interpret) and is_haar and not exact
            and not tilted and not deep_any
            # escape hatch while the remote XLA compile service can stall
            # on new large program shapes (bench.py uses it to guarantee a
            # measurement on the XLA-front configuration)
            and os.environ.get("CCTPU_STATIC_FRONT", "1") != "0"
        )
        assert not (plan.packed and not use_static_front), (
            "shelf-packed plans are only consumable by the static-front "
            "configuration (see wants_packed_plan)"
        )
        if use_static_front:
            # dense static-Pallas stages until ~STATIC_FRONT_TREES trees
            # have run (by then survivors fit the MXU tail comfortably);
            # the dense VPU work per tree is the dominant frame cost, so
            # the boundary sits as early as the tail capacity allows.
            # CCTPU_FRONT_TREES overrides for cutover sweeps.
            front_trees = int(os.environ.get(
                "CCTPU_FRONT_TREES", str(self.STATIC_FRONT_TREES)
            ))
            n_dense, budget = n_stages, 0
            for si in range(1, n_stages):
                budget += packed.stages[si].ntrees
                if budget >= front_trees:
                    n_dense = si + 1
                    break
        elif deep_any:
            # the MXU tail packs stumps only — deep-tree cascades (e.g.
            # -maxDepth 2 trainer output, eye_tree_eyeglasses) run EVERY
            # stage in the dense front: still one chained-async dispatch
            # pipeline with zero host syncs, unlike the per-stage-synced
            # compact engine fallback they previously hit
            n_dense = n_stages
        else:
            n_dense = n_front
        self.n_dense = n_dense
        # every per-window tail cost (nonzero gather, patchify layout
        # traffic, limb matmuls) scales with the STATIC capacity — after
        # the ≥250-tree static front, survivors are a few % of positions,
        # so the deep-cutover capacity is halved (overflow still falls
        # back to the adaptive engine)
        cap = self.tail_n
        if use_static_front:
            # CCTPU_TAIL_CAP overrides for cutover sweeps (an earlier
            # front boundary leaves more survivors — the r3 150-tree
            # sweep failed only because the cap was held here)
            cap = min(cap, int(os.environ.get(
                "CCTPU_TAIL_CAP", str(1 << 16)
            )))
        tail_n = max(
            32,
            min(cap, 1 << int(np.ceil(np.log2(max(out_h * out_w, 2))))),
        )
        nonzero_tail = nonzero_det = tail_fn = sparse_det = None
        if n_dense < n_stages:
            nonzero_tail = make_nonzero_fn(out_h, out_w, tail_n, grid_rows)
            # slot-major limb planes (emit="limbs_rel_slot") skip the
            # patchify kernel's octet transpose, but measured on-chip the
            # transpose is NOT the bottleneck (grid-step overhead is) and
            # the +28% stride-32 contraction width costs ~0.9 ms in the
            # tail matmuls — so the default stays on the tight layout;
            # CCTPU_SLOT_LIMBS=1 re-enables the alternative
            slot = (
                (use_pallas or self.interpret) and is_haar and not tilted
                and os.environ.get("CCTPU_SLOT_LIMBS", "0") == "1"
            )
            if is_haar:
                tail_fn = make_tail_compact_fn(
                    packed, n_dense, exact, tail_n, slot_major=slot
                )
            else:
                tail_fn = make_lbp_tail_compact_fn(
                    packed, n_dense, exact, tail_n
                )
            # the patchify kernel supports windows ≤ 31 px (one 32-lane
            # output slot per window); larger windows (75×32 LBP text
            # cascades) take the XLA dynamic-slice extractor on any
            # backend. Interpret mode uses the kernel too so CPU tests
            # cover the production TPU path.
            fits_ppatch = packed.win_w <= 31 and packed.win_h <= 31
            use_ppatch = (use_pallas or self.interpret) and fits_ppatch
            if use_ppatch:
                # the kernel emits the MXU tail's bf16 limb planes
                # directly (limb selects fused into the kernel-output
                # epilogue; the int32 patch matrix never hits HBM)
                ppatch, _ = make_pallas_patchify(
                    packed.win_w, packed.win_h,
                    plan.canvas_h, plan.canvas_w, tail_n,
                    emit=(
                        "limbs_abs" if tilted
                        else "limbs_rel_slot" if slot else "limbs_rel"
                    ),
                    interpret=self.interpret,
                )
            else:
                xpatch = make_patchify_fn(packed.win_w, packed.win_h, tilted)
        elif use_static_front:
            sparse_det = make_sparse_nonzero_fn(
                out_h, out_w, max_det,
                min(self.K_ROWS, len(grid_rows)), grid_rows,
            )
        else:
            nonzero_det = make_nonzero_fn(out_h, out_w, max_det, grid_rows)
        if use_static_front:
            from cascadeclassifier_tpu.detect.pallas_front import (
                BLK_H,
                BLK_W,
                front_pad_geometry,
                live_block_list,
                make_packed_band_front_fn,
                make_packed_plane_front_fn,
                make_plane_front_fn,
                make_static_front_fn,
                plane_pad_geometry,
            )

            # survivor-packed front (measured experiment, default OFF):
            # the kernels walk a 16×512 live-block list instead of the
            # full canvas. On-chip at 1080p it ran 36.7 ms vs 18.8 dense
            # — per-block overheads (serial DMA latency, per-stage guard
            # reductions, cond scheduling barriers ≈ 15-40 µs/block)
            # dwarf the dense kernel's ~5 µs/tile amortized cost, and
            # the ~25-45% live-block fraction cannot recoup them. Kept
            # behind CCTPU_PACKED_FRONT=1 with interpret-mode parity
            # coverage; BENCHMARKS.md (round 5 section) records the
            # numbers.
            use_packed_front = (
                os.environ.get("CCTPU_PACKED_FRONT", "0") == "1"
            )

            # ystep-2 levels sit at the TOP of the canvas (factor grows
            # down the stack; ystep drops to 1 once factor >= 2): their
            # grid anchors all land on even (row, col) (pyramid.py aligns
            # block_top), so the parity-plane kernel evaluates just the
            # (even, even) anchor plane over rows [0, split_r) — 4x fewer
            # positions. The remaining ystep-1 levels keep the
            # full-density kernel over rows [row_lo, fp_hp).
            step1 = np.nonzero(plan.ystep == 1)[0]
            split_r = (
                int(plan.block_top[step1[0]]) if len(step1) else out_h
            )
            has_plane = split_r > 0
            has_band = len(step1) > 0

            # per-chunk tile plan (FRONT_PLAN): stages 1..n_dense-1 are
            # grouped by cumulative tree budget; each group's kernels run
            # at the entry's tile height (finer tiles after the first
            # stages → the per-tile dead-skip tracks survivor
            # clustering). Masks are re-fit between geometries.
            fplan = []
            for part in os.environ.get(
                "CCTPU_FRONT_PLAN", self.FRONT_PLAN
            ).split(","):
                b, th = part.split(":")
                fplan.append((int(b), int(th)))
            if use_packed_front:
                fplan = [(1 << 30, self.TILE_H)]  # packed: one geometry
            static_chunks = []  # [(stage_ids, tile_h)]
            ei, cur, budget = 0, [], 0
            for si in range(1, n_dense):
                cur.append(si)
                budget += packed.stages[si].ntrees
                if budget >= fplan[ei][0]:
                    static_chunks.append((cur, fplan[ei][1]))
                    cur, budget = [], 0
                    ei = min(ei + 1, len(fplan) - 1)
            if cur:
                static_chunks.append((cur, fplan[ei][1]))
            tile_hs = [th for (_ids, th) in static_chunks] or [self.TILE_H]

            def geom_for(th):
                fp = front_pad_geometry(
                    plan.canvas_h, plan.canvas_w,
                    packed.win_w, packed.win_h, th, self.TILE_W,
                )
                g = dict(
                    th=th, fp_hp=fp[0], fp_wp=fp[1], fp_hh=fp[2],
                    fp_hw=fp[3], row_lo=(split_r // th) * th,
                )
                if has_plane:
                    pg = plane_pad_geometry(
                        split_r, out_w, packed.win_w, packed.win_h,
                        th, self.TILE_W,
                    )
                    g.update(
                        pg_h2=pg[0], pg_w2=pg[1], pg_hh2=pg[2],
                        pg_hw2=pg[3],
                    )
                return g

            geoms = {th: geom_for(th) for th in set(tile_hs)}
            g0 = geoms[tile_hs[0]]  # prep emits masks in this geometry
            gL = geoms[tile_hs[-1]]  # the tail consumes this geometry
            fp_hp, fp_wp = g0["fp_hp"], g0["fp_wp"]
            row_lo = g0["row_lo"]
            if has_plane:
                pg_h2, pg_w2 = g0["pg_h2"], g0["pg_w2"]
                pg_hh2, pg_hw2 = g0["pg_hh2"], g0["pg_hw2"]
                # the padded canvas must cover every chunk's band tiles,
                # the patchify DMAs, AND an even shape whose parity
                # planes span every chunk's plane tiles + halos
                pad_min = (
                    max(
                        max(
                            g["fp_hp"] + g["fp_hh"]
                            for g in geoms.values()
                        ),
                        max(
                            2 * (g["pg_h2"] + g["pg_hh2"]) + 2
                            for g in geoms.values()
                        ),
                    ),
                    max(
                        max(
                            g["fp_wp"] + g["fp_hw"]
                            for g in geoms.values()
                        ),
                        max(
                            2 * (g["pg_w2"] + g["pg_hw2"]) + 2
                            for g in geoms.values()
                        ),
                    ),
                )
                pad_min = (-(-pad_min[0] // 2) * 2, -(-pad_min[1] // 2) * 2)
            else:
                pad_min = (
                    max(g["fp_hp"] + g["fp_hh"] for g in geoms.values()),
                    max(g["fp_wp"] + g["fp_hw"] for g in geoms.values()),
                )
        else:
            has_plane = has_band = False
            pad_min = (0, 0)

        # split-tail extraction: when the hybrid static front keeps its
        # survivor masks in plane/band layout, run nonzero DIRECTLY on
        # them — the plane mask is 4x smaller than the stitched canvas
        # (the per-row int16 sort dominates extraction) and the stitch
        # program drops out of the chain entirely. Order becomes
        # plane-then-band instead of ascending scan order; no consumer
        # requires scan order (parity tests compare sorted sets).
        nz_plane = nz_band = nz_comb = None
        if use_static_front and n_dense < n_stages:
            from cascadeclassifier_tpu.detect.compact import (
                make_block_nonzero_fn,
            )

            # The merged (plane ⊕ band) extraction saves ~2.4 ms on paper
            # (one kb·128 sort instead of two) but its combined-mask
            # geometry reproducibly FAULTS the TPU worker at 1080p
            # (FailedPrecondition mid-batch; same fault class as
            # kb=1<<13, see make_block_nonzero_fn) — measured r5, two
            # independent runs, while the two-call path benches clean at
            # 20.4 fps. Default OFF; CCTPU_NZ_MERGED=1 to re-try on a
            # newer XLA. Raising kb past 1<<14 would double the sort
            # that the merge exists to halve, so there is no winning
            # kb for the combined geometry on this toolchain.
            merged = os.environ.get("CCTPU_NZ_MERGED", "0") == "1"
            if has_plane and has_band and merged:
                # ONE extraction over the row-concatenated plane+band
                # masks (unified max(out_w, padded-plane-width) index
                # space): the kb·128 flat-index sort dominates this
                # phase and is paid once instead of twice (2.2 + 2.5 ms
                # → ~2.6 ms measured). Ascending combined indices =
                # plane-then-band — the same order the two-call path
                # produced.
                w_u = max(out_w, pg_w2)
                nz_comb = make_block_nonzero_fn(
                    gL["pg_h2"] + out_h - gL["row_lo"], w_u, tail_n
                )
            elif has_plane and has_band:
                nz_plane = make_block_nonzero_fn(
                    gL["pg_h2"], pg_w2, tail_n
                )
                nz_band = make_block_nonzero_fn(
                    out_h - gL["row_lo"], out_w, tail_n
                )
            elif has_plane:
                nz_plane = make_block_nonzero_fn(
                    gL["pg_h2"], pg_w2, tail_n
                )
            elif has_band:
                nz_band = make_block_nonzero_fn(
                    out_h - gL["row_lo"], out_w, tail_n
                )

        def stage_pass(sum2d, tilt2d, inv_nf, si):
            st = packed.stages[si]
            if st.deep_trees is not None:
                ssum = dense_stage_deep(
                    sum2d, tilt2d, st, out_h, out_w, inv_nf, is_haar,
                    exact=exact,
                )
            elif is_haar:
                ssum = dense_stage_haar(
                    sum2d, tilt2d, st, out_h, out_w, inv_nf, exact=exact
                )
            else:
                ssum = dense_stage_lbp(sum2d, st, out_h, out_w, exact=exact)
            if exact:
                with jax.enable_x64(True):
                    return ssum >= jnp.float64(st.threshold)
            return ssum >= jnp.float32(st.threshold)

        # the head is TWO chained programs: canvas | gate+stage0+walk —
        # fusing all four pieces into one program sends the remote XLA
        # compile into a >20-minute stall, while any pairwise split
        # compiles in seconds (empirically bisected; cause unknown)
        #
        # The pixel canvas is allocated at the final padded geometry up
        # front and the single-pass Pallas integral kernel writes the
        # (sum, sq) integrals straight into it — no separate pad program,
        # no log-depth XLA cumsum chains (detect/pallas_integral.py).
        # The vmapped batch head keeps the XLA cumsums (the kernel's
        # blocked grid does not vmap).
        use_int_kernel = (
            (use_pallas or self.interpret) and self.BATCH_F == 1
        )
        from cascadeclassifier_tpu.detect.compact import (
            padded_canvas_shape,
        )

        pad_shape = padded_canvas_shape(
            plan.canvas_h, plan.canvas_w, packed.win_h, *pad_min,
            row_mult=256 if use_int_kernel else 8,
        )

        def canvas(img, tab, R, Cs):
            resize_mats = (
                R, [(*m, c) for m, c in zip(col_meta, Cs)]
            )
            sum_pad, sq2d, tilt2d = _build_canvas(
                img, tab, img_w, img_h, need_sq=is_haar,
                need_tilted=tilted, resize_mats=resize_mats,
                pad_shape=pad_shape, use_kernel=use_int_kernel,
                interpret=self.interpret,
            )
            if sq2d is None:
                sq2d = sum_pad
            if tilt2d is None:
                # placeholder so the chained-program signatures stay
                # uniform; no stage reads it in untilted cascades
                return sum_pad, sq2d, sum_pad
            return sum_pad, sq2d, pad_canvas_for_patchify(
                tilt2d, packed.win_h, *pad_min
            )

        def _to_planes(x):
            # row split by sublane-strided slice (cheap), then column
            # deinterleave via a reshape relayout: 4.3 ms vs 62 ms for the
            # single reshape+transpose and 602 ms for lane-strided slices
            # (measured on the v5e at the 1080p canvas; bit-identical)
            e, o = x[0::2, :], x[1::2, :]

            def cols(y):
                yr = y.reshape(y.shape[0], y.shape[1] // 2, 2)
                return jnp.stack([yr[:, :, 0], yr[:, :, 1]])

            return jnp.stack([cols(e), cols(o)])

        # even window dims put every variance-gate sq corner on the
        # (odd, odd) plane (dense.py::plane_rect_sum_oo) — the split
        # then materializes ONE sq plane instead of four (the sq planes
        # have no other consumer), saving ~3/4 of the sq relayout writes
        sq_oo_only = packed.win_w % 2 == 0 and packed.win_h % 2 == 0

        # only the plane region's rows have plane consumers (the kernels
        # slice ≤ pg_h2 + halo rows from each parity plane); band rows of
        # the canvas need no deinterleave — slicing first drops ~20-45%
        # of the relayout traffic (more under shelf-packed plans, whose
        # band region is a third the rows)
        if has_plane:
            psplit_rows = min(
                pad_shape[0] - (pad_shape[0] & 1),
                max(
                    2 * (g["pg_h2"] + g["pg_hh2"]) + 2
                    for g in geoms.values()
                ),
            )

        def plane_split(sum_pad, sq_pad):
            # the four parity planes planes[a, b] = x[a::2, b::2] feed
            # the plane prep/front's static corner reads. A SEPARATE
            # program: fused into the canvas build it trips the remote
            # XLA compile stall (same pathology as the canvas+gate
            # fusion, engine.py head comment).
            sum_pad = sum_pad[:psplit_rows]
            sq_pad = sq_pad[:psplit_rows]
            if sq_oo_only:
                o = sq_pad[1::2, :]
                sq_planes = o.reshape(o.shape[0], o.shape[1] // 2, 2)[
                    :, :, 1
                ]
            else:
                sq_planes = _to_planes(sq_pad)
            return _to_planes(sum_pad), sq_planes

        def prep(sum2d, sq2d, tilt2d, tab):
            """Gate + stage 0 + the serial-walk visited mask."""
            if is_haar:
                gate, inv_nf = dense_variance_gate(
                    sum2d, sq2d, packed.win_w, packed.win_h, out_h, out_w
                )
            else:
                gate = jnp.ones((out_h, out_w), bool)
                inv_nf = jnp.zeros((out_h, out_w), jnp.float32)
            # visit grid + ordinal generated on device from tab's small
            # per-row vectors (a 22 MB grid literal + 88 MB cumsum
            # constant otherwise dominate compile time)
            cols = jax.lax.broadcasted_iota(jnp.int32, (out_h, out_w), 1)
            grid = (
                tab["row_is_grid"][:out_h, None]
                & (cols <= tab["row_maxc"][:out_h, None])
                & (
                    (~tab["row_step2"][:out_h, None])
                    | ((cols & 1) == 0)
                )
            )
            ordinal = jnp.cumsum(grid.astype(jnp.int32), axis=1)
            passed0 = stage_pass(sum2d, tilt2d, inv_nf, 0)
            m0 = gate & (~passed0)
            visited = parity_visited(m0, grid, ordinal)
            alive = gate & grid & passed0 & visited
            return inv_nf, alive

        # plane/band prep: the static-front head computes gate + stage 0
        # + the serial-walk visited mask DIRECTLY in the split layout —
        # the parity-plane region does its dense work on the (even, even)
        # anchor plane (4x fewer positions; every corner read is a dense
        # slice of a parity plane), the ystep-1 band runs full-density on
        # its row slice. Replaces the full-canvas prep + mask_split pair:
        # less work AND simpler program shapes for the remote compiler.
        if use_static_front and has_plane:
            from cascadeclassifier_tpu.detect.dense import (
                plane_stage_haar,
                plane_variance_gate,
            )

            er = np.arange(pg_h2) * 2  # canvas row of each plane anchor
            ok_r = er < min(out_h, len(plan.row_is_grid))
            p_grid_np = np.zeros(pg_h2, bool)
            p_grid_np[ok_r] = (
                plan.row_is_grid[er[ok_r]] & plan.row_step2[er[ok_r]]
            )
            p_maxc_np = np.full(pg_h2, -1, np.int32)
            p_maxc_np[ok_r] = plan.row_maxc[er[ok_r]] >> 1

            def prep_plane(planes_sum, planes_sq):
                """Gate + stage 0 + walk on the anchor plane (+ the
                live-block list feeding the packed front)."""
                gate, inv_p = plane_variance_gate(
                    planes_sum, planes_sq, packed.win_w, packed.win_h,
                    pg_h2, pg_w2,
                )
                cols2 = jax.lax.broadcasted_iota(
                    jnp.int32, (pg_h2, pg_w2), 1
                )
                grid = (
                    jnp.asarray(p_grid_np)[:, None]
                    & (cols2 <= jnp.asarray(p_maxc_np)[:, None])
                )
                ordinal = jnp.cumsum(grid.astype(jnp.int32), axis=1)
                st0 = packed.stages[0]
                passed0 = (
                    plane_stage_haar(planes_sum, st0, pg_h2, pg_w2, inv_p)
                    >= jnp.float32(st0.threshold)
                )
                visited = parity_visited(gate & (~passed0), grid, ordinal)
                alive = gate & grid & passed0 & visited
                if not use_packed_front:
                    return alive.astype(jnp.int8), inv_p, None, None
                a_p = alive.astype(jnp.int32)
                blk, nblk = live_block_list(
                    a_p, (pg_h2 // BLK_H) * (pg_w2 // BLK_W)
                )
                return a_p, inv_p, blk, nblk.reshape(1)
        else:
            prep_plane = None

        if use_static_front and has_band:

            def prep_band(sum_pad, sq_pad, tab):
                """Gate + stage 0 + walk on the ystep-1 bottom band
                (full density; rows are walk-independent so the band
                slice is self-contained)."""
                hb, hbr = fp_hp - row_lo, out_h - row_lo
                sum_b = sum_pad[row_lo:]
                gate, inv_r = dense_variance_gate(
                    sum_b, sq_pad[row_lo:], packed.win_w, packed.win_h,
                    hbr, out_w,
                )
                reset = None
                if plan.packed:
                    # shelf-packed band: several levels share each canvas
                    # row — the 2D anchor grid replaces the per-row
                    # descriptors, and the inter-level gap columns reset
                    # the serial-walk recurrence (each level walks as its
                    # own image in OpenCV)
                    grid = (
                        tab["grid2d"][row_lo:out_h]
                        & (~tab["row_is_plane"][row_lo:out_h, None])
                    )
                    reset = ~grid
                    st2 = None
                else:
                    cols = jax.lax.broadcasted_iota(
                        jnp.int32, (hbr, out_w), 1
                    )
                    rg = tab["row_is_grid"][row_lo:out_h]
                    st2 = tab["row_step2"][row_lo:out_h]
                    mc = tab["row_maxc"][row_lo:out_h]
                    grid = (
                        rg[:, None]
                        & (cols <= mc[:, None])
                        & ((~st2[:, None]) | ((cols & 1) == 0))
                    )
                ordinal = jnp.cumsum(grid.astype(jnp.int32), axis=1)
                st0 = packed.stages[0]
                ssum = dense_stage_haar(
                    sum_b, sum_b, st0, hbr, out_w, inv_r, exact=False
                )
                passed0 = ssum >= jnp.float32(st0.threshold)
                visited = parity_visited(
                    gate & (~passed0), grid, ordinal, reset
                )
                alive = gate & grid & passed0 & visited
                if st2 is not None:
                    alive = alive & (~st2[:, None])
                mdt = jnp.int32 if use_packed_front else jnp.int8
                a_b = (
                    jnp.zeros((hb, fp_wp), mdt)
                    .at[:hbr, :out_w]
                    .set(alive.astype(mdt))
                )
                inv_b = (
                    jnp.ones((hb, fp_wp), jnp.float32)
                    .at[:hbr, :out_w]
                    .set(inv_r)
                )
                if not use_packed_front:
                    return a_b, inv_b, None, None
                blk, nblk = live_block_list(
                    a_b, (hb // BLK_H) * (fp_wp // BLK_W)
                )
                return a_b, inv_b, blk, nblk.reshape(1)
        else:
            prep_band = None

        # dense front chunks of ≤ FRONT_CHUNK trees (XLA front); the
        # static front's chunking came from FRONT_PLAN above
        chunks = []
        if not use_static_front:
            cur, budget = [], 0
            for si in range(1, n_dense):
                cur.append(si)
                budget += packed.stages[si].ntrees
                if budget >= self.FRONT_CHUNK:
                    chunks.append(cur)
                    cur, budget = [], 0
            if cur:
                chunks.append(cur)

        def make_front(stage_ids):
            def front(sum2d, tilt2d, inv_nf, alive):
                for si in stage_ids:
                    alive = alive & stage_pass(sum2d, tilt2d, inv_nf, si)
                    alive = jax.lax.optimization_barrier(alive)
                return alive

            return front

        def stitch(state):
            """Plane-layout + band survivor masks (in the LAST front
            chunk's geometry) → full (out_h, out_w) grid. A separate
            program (see mask_split)."""
            a_p, a_b = state[0], state[4]
            alive = jnp.zeros((out_h, out_w), bool)
            if has_plane:
                # interleave the plane mask back onto even (r, c):
                # stack+reshape (lowers to concat, no strided
                # scatter — XLA scatters are slow to compile/run at
                # this size)
                h2, w2 = gL["pg_h2"], pg_w2
                z = jnp.zeros_like(a_p)
                up = jnp.stack([a_p, z], 2).reshape(h2, 2 * w2)
                zz = jnp.zeros_like(up)
                up = jnp.stack([up, zz], 1).reshape(2 * h2, 2 * w2)
                rows = min(2 * h2, out_h)
                cols = min(2 * w2, out_w)
                alive = alive.at[:rows, :cols].set(
                    up[:rows, :cols] != 0
                )
            if has_band:
                rl = gL["row_lo"]
                bm = a_b[: out_h - rl, :out_w] != 0
                alive = alive.at[rl:].set(alive[rl:] | bm)
            return alive

        def _run_tail(sum2d, tilt2d, inv_vec, idx, r, c, cnt,
                      extra_oflow=False):
            """Patchify + re-compacting MXU tail + detection collection
            over an extracted (tail_n,) survivor list; inv_vec holds each
            slot's 1/normfactor."""
            from cascadeclassifier_tpu.detect.compact import _nonzero_1d

            oflow = (cnt > tail_n) | extra_oflow
            if use_ppatch:
                ps = ppatch(sum2d, r, c, cnt)
                pt = ppatch(tilt2d, r, c, cnt) if tilted else ps
            else:
                ps, pt = xpatch(sum2d, tilt2d, r, c)
            widx, t_alive, t_oflow = tail_fn(ps, pt, inv_vec, cnt)
            oflow = oflow | t_oflow
            # final detections come straight from the tail's survivor
            # slots; the only compaction left is a cheap 1-D sort over
            # the final batch — a second full-grid row-sort (nonzero_det)
            # cost ~17 ms/frame
            fcnt = jnp.sum(t_alive, dtype=jnp.int32)
            k = min(max_det, int(t_alive.shape[0]))
            sel = _nonzero_1d(t_alive.astype(jnp.int32), k)
            fidx = idx[widx[sel]]
            if k < max_det:
                fidx = jnp.pad(fidx, (0, max_det - k))
            fidx = jnp.where(
                jnp.arange(max_det, dtype=jnp.int32) < fcnt, fidx, 0
            )
            return fidx, fcnt, cnt, oflow

        def compact_collect_static(alive):
            """All-static path: the kernels already ran EVERY stage —
            survivors ARE the raw detections; extract them sparsely."""
            fidx, fcnt, row_oflow = sparse_det(alive)
            oflow = row_oflow | (fcnt > max_det)
            return fidx, fcnt, fcnt, oflow

        def compact_collect(sum2d, tilt2d, inv_nf, alive):
            """Survivor extraction, re-compacting MXU tail, collection."""
            cnt = jnp.sum(alive, dtype=jnp.int32)
            if n_dense < n_stages:
                idx = nonzero_tail(alive)
                r = (idx // out_w).astype(jnp.int32)
                c = (idx % out_w).astype(jnp.int32)
                return _run_tail(
                    sum2d, tilt2d, inv_nf.reshape(-1)[idx], idx, r, c, cnt
                )
            fcnt = jnp.sum(alive, dtype=jnp.int32)
            fidx = nonzero_det(alive)
            return fidx, fcnt, cnt, cnt > tail_n

        def compact_collect_split(sum2d, tilt2d, state):
            """Split-tail variant: survivors (and their 1/normfactor)
            extracted straight from the plane-layout and band arrays (in
            the LAST front chunk's geometry; see nz_plane/nz_band/
            nz_comb)."""
            a_p, inv_p, a_b, inv_b = (
                state[0], state[1], state[4], state[5]
            )
            rl = gL["row_lo"]
            q = jnp.arange(tail_n, dtype=jnp.int32)
            if has_plane and has_band and nz_comb is None:
                # two-call path (CCTPU_NZ_MERGED=0): independent plane
                # and band extractions, concatenated plane-then-band
                cntp = jnp.sum(a_p != 0, dtype=jnp.int32)
                idxp, ofp = nz_plane(a_p != 0)
                rp = (idxp // pg_w2).astype(jnp.int32) * 2
                cp = (idxp % pg_w2).astype(jnp.int32) * 2
                ivp = inv_p.reshape(-1)[idxp]
                bm = a_b[: out_h - rl, :out_w] != 0
                cntb = jnp.sum(bm, dtype=jnp.int32)
                idxb, ofb = nz_band(bm)
                rb = rl + (idxb // out_w).astype(jnp.int32)
                cb = (idxb % out_w).astype(jnp.int32)
                ivb = inv_b[: out_h - rl, :out_w].reshape(-1)[idxb]
                blk_oflow = ofp | ofb
                qb = jnp.clip(q - cntp, 0, tail_n - 1)
                r = jnp.where(q < cntp, rp, rb[qb])
                c = jnp.where(q < cntp, cp, cb[qb])
                iv = jnp.where(q < cntp, ivp, ivb[qb])
                cnt = cntp + cntb
            elif has_plane and has_band:
                # merged path: one block-nonzero over the concatenated
                # (plane ⊕ band) masks in a unified w_u-wide space
                h2 = gL["pg_h2"]
                hb = out_h - rl
                w_u = max(out_w, pg_w2)
                pm = jnp.zeros((h2, w_u), bool).at[:, :pg_w2].set(
                    a_p != 0
                )
                bm = jnp.zeros((hb, w_u), bool).at[:, :out_w].set(
                    a_b[:hb, :out_w] != 0
                )
                comb = jnp.concatenate([pm, bm], 0)
                idx_u, blk_oflow = nz_comb(comb)
                cnt = jnp.sum(pm, dtype=jnp.int32) + jnp.sum(
                    bm, dtype=jnp.int32
                )
                split = h2 * w_u
                is_p = idx_u < split
                ru = (idx_u // w_u).astype(jnp.int32)
                cu = (idx_u % w_u).astype(jnp.int32)
                r = jnp.where(is_p, ru * 2, rl + ru - h2)
                c = jnp.where(is_p, cu * 2, cu)
                inv_pw = jnp.ones((h2, w_u), jnp.float32).at[
                    :, :pg_w2
                ].set(inv_p)
                inv_bw = jnp.ones((hb, w_u), jnp.float32).at[
                    :, :out_w
                ].set(inv_b[:hb, :out_w])
                inv_cat = jnp.concatenate([inv_pw, inv_bw], 0)
                iv = inv_cat.reshape(-1)[idx_u]
            elif has_plane:
                cnt = jnp.sum(a_p != 0, dtype=jnp.int32)
                idxp, blk_oflow = nz_plane(a_p != 0)
                r = (idxp // pg_w2).astype(jnp.int32) * 2
                c = (idxp % pg_w2).astype(jnp.int32) * 2
                iv = inv_p.reshape(-1)[idxp]
            else:
                bm = a_b[: out_h - rl, :out_w] != 0
                cnt = jnp.sum(bm, dtype=jnp.int32)
                idxb, blk_oflow = nz_band(bm)
                r = rl + (idxb // out_w).astype(jnp.int32)
                c = (idxb % out_w).astype(jnp.int32)
                iv = inv_b[: out_h - rl, :out_w].reshape(-1)[idxb]
            live = q < cnt
            r = jnp.where(live, r, 0)
            c = jnp.where(live, c, 0)
            idx = r * out_w + c
            return _run_tail(sum2d, tilt2d, iv, idx, r, c, cnt, blk_oflow)

        if use_static_front:

            def _fit(x, rows, r0=0, fill=0):
                """Rows r0..r0+rows of x (slice, zero/fill-pad), width
                kept — re-fits masks between chunk tile geometries."""
                x = x[r0:]
                if x.shape[0] >= rows:
                    return x[:rows]
                pad = jnp.full(
                    (rows - x.shape[0],) + x.shape[1:], fill, x.dtype
                )
                return jnp.concatenate([x, pad], 0)

            def make_static_chunk(ids, gp, gc, frames=None):
                th = gc["th"]
                assert frames is None or not use_packed_front
                plane_fn = band_fn = None
                if has_plane and use_packed_front:
                    plane_fn = make_packed_plane_front_fn(
                        packed.stages, ids, packed.win_w, packed.win_h,
                        split_r, out_w,
                        (pg_h2 // BLK_H) * (pg_w2 // BLK_W),
                        self.TILE_H, self.TILE_W,
                        interpret=self.interpret,
                    )[0]
                elif has_plane:
                    plane_fn = make_plane_front_fn(
                        packed.stages, ids, packed.win_w, packed.win_h,
                        split_r, out_w, th, self.TILE_W,
                        interpret=self.interpret, frames=frames,
                    )[0]
                if has_band and use_packed_front:
                    hb_cap = (
                        ((fp_hp - row_lo) // BLK_H) * (fp_wp // BLK_W)
                    )
                    band_fn = make_packed_band_front_fn(
                        packed.stages, ids, packed.win_w, packed.win_h,
                        plan.canvas_h, plan.canvas_w, hb_cap,
                        self.TILE_H, self.TILE_W,
                        interpret=self.interpret, row_lo=row_lo,
                    )[0]
                elif has_band:
                    band_fn = make_static_front_fn(
                        packed.stages, ids, packed.win_w, packed.win_h,
                        plan.canvas_h, plan.canvas_w,
                        th, self.TILE_W,
                        interpret=self.interpret, row_lo=gc["row_lo"],
                        frames=frames,
                    )[0]

                def front(sum2d, planes, state):
                    a_p, inv_p, pblk, pnb, a_b, inv_b, bblk, bnb = state
                    if gc is not gp:
                        if has_plane:
                            a_p = _fit(a_p, gc["pg_h2"])
                            inv_p = _fit(inv_p, gc["pg_h2"], fill=1.0)
                        if has_band:
                            dr = gc["row_lo"] - gp["row_lo"]
                            hb = gc["fp_hp"] - gc["row_lo"]
                            a_b = _fit(a_b, hb, r0=dr)
                            inv_b = _fit(inv_b, hb, r0=dr, fill=1.0)
                    if plane_fn is not None and use_packed_front:
                        a_p = plane_fn(planes, inv_p, a_p, pblk, pnb)
                    elif plane_fn is not None:
                        a_p = plane_fn(planes, inv_p, a_p)
                    if band_fn is not None and use_packed_front:
                        a_b = band_fn(sum2d, inv_b, a_b, bblk, bnb)
                    elif band_fn is not None:
                        a_b = band_fn(sum2d, inv_b, a_b)
                    return a_p, inv_p, pblk, pnb, a_b, inv_b, bblk, bnb

                return jax.jit(front)

            fronts = []
            gp = g0
            for (ids, th) in static_chunks:
                gc = geoms[th]
                fronts.append(make_static_chunk(ids, gp, gc))
                gp = gc

            if not use_packed_front and len(geoms) == 1:
                # in-kernel frame batching (CCTPU_KBATCH): same chunk
                # kernels with a leading frame grid dimension; the mask
                # re-fit between geometries doesn't batch, so this is
                # single-geometry-plan only
                def mk_batched_fronts(F, _chunks=tuple(static_chunks)):
                    return [
                        make_static_chunk(ids, g0, g0, frames=F)
                        for (ids, _th) in _chunks
                    ]

                self._mk_batched_fronts = mk_batched_fronts
            else:
                self._mk_batched_fronts = None
        else:
            fronts = [jax.jit(make_front(ids)) for ids in chunks]
        use_split_tail = use_static_front and n_dense < n_stages
        if use_split_tail:
            tail_jit = jax.jit(compact_collect_split)
        elif sparse_det is not None:
            tail_jit = jax.jit(compact_collect_static)
        else:
            tail_jit = jax.jit(compact_collect)
        # sub-programs of the tail, exposed for perf bisection (scripts
        # under /tmp time these independently on the real chip)
        self._parts = {
            "nz_plane": nz_plane,
            "nz_band": nz_band,
            "nz_comb": nz_comb,
            "nonzero_tail": nonzero_tail,
            "tail_fn": tail_fn,
            "ppatch": ppatch if (n_dense < n_stages and use_ppatch) else None,
            "tail_n": tail_n,
            "geom": dict(
                out_h=out_h, out_w=out_w,
                # tail-side geometry = the LAST front chunk's
                row_lo=gL["row_lo"] if use_static_front else 0,
                pg=(gL["pg_h2"], pg_w2)
                if (use_static_front and has_plane) else None,
            ),
        }
        return (
            (jax.jit(canvas),
             None if use_static_front else jax.jit(prep),
             jax.jit(plane_split) if has_plane else None,
             jax.jit(prep_plane) if prep_plane is not None else None,
             jax.jit(prep_band) if prep_band is not None else None,
             jax.jit(stitch)
             if use_static_front and not use_split_tail else None),
            fronts,
            tail_jit,
            consts,
        )

    # frames per vmapped head program (canvas/prep/front run F frames
    # per dispatch). Historical: with the sub-ms XLA-front programs the
    # ~0.7 ms per-dispatch tunnel cost capped throughput and vmapping
    # divided it by F; with the 10-40 ms static-front programs the
    # per-frame path is faster (see __init__) — instances default to 1
    # via CCTPU_BATCH_F
    BATCH_F = 1

    def batch_program(self, plan, max_det: int, F: int):
        """Vmapped-over-F variants of the head programs (canvas → front);
        the survivor tail stays per-frame (its pallas patchify uses SMEM
        scalars that don't batch)."""
        key = (plan.canvas_h, plan.canvas_w, max_det, "batch", F)
        if key not in self._programs:
            (canvas, prep, psplit, prep_plane, prep_band, stitch), \
                fronts, tail, consts = self.program(plan, max_det)

            def vm(f, ax):
                return jax.jit(jax.vmap(f, in_axes=ax))

            use_static = prep is None
            # in-kernel frame batching: rebuild the static chunk
            # kernels with a leading F-frame grid dimension (vmap can't
            # batch their HBM ANY operands, a native grid axis can) —
            # one dispatch walks all F frames' tiles
            import os

            kbatch = (
                use_static
                and int(os.environ.get("CCTPU_KBATCH", "0")) > 0
                and getattr(self, "_mk_batched_fronts", None) is not None
            )
            self._programs[key] = (
                (
                    vm(canvas, (0, None, None, None)),
                    None if use_static else vm(prep, (0, 0, 0, None)),
                    vm(psplit, (0, 0)) if psplit is not None else None,
                    vm(prep_plane, (0, 0))
                    if prep_plane is not None else None,
                    vm(prep_band, (0, 0, None))
                    if prep_band is not None else None,
                    # stitch runs per frame, after the per-frame fronts
                    stitch,
                ),
                # static-front kernels take HBM-resident (memory space
                # ANY) operands, which Pallas cannot vmap — per frame by
                # default (chained async dispatches, no syncs), or
                # F-framed kernels under CCTPU_KBATCH
                ("kbatch", self._mk_batched_fronts(F)) if kbatch
                else fronts if use_static
                else [vm(f, (0, 0, 0, 0)) for f in fronts],
                tail,
                consts,
            )
        return self._programs[key]

    def detect_async_batch(self, plan, tab, imgs, max_det: int):
        """Submit F same-geometry frames ((F, H, W) device/host uint8)
        through the vmapped head programs; returns F per-frame device
        tuples (fidx, fcnt, tail_cnt, overflow)."""
        F = int(imgs.shape[0])
        (canvas, prep, psplit, prep_plane, prep_band, stitch), fronts, \
            tail, (R, Cs) = self.batch_program(plan, max_det, F)
        sum_b, sq_b, tilt_b = canvas(jnp.asarray(imgs), tab, R, Cs)
        if prep is None:  # static front: split-layout head
            planes = psplit(sum_b, sq_b) if psplit is not None else None
            a_p = inv_p = a_b = inv_b = None
            pblk = pnb = bblk = bnb = None
            if prep_plane is not None:
                a_p, inv_p, pblk, pnb = prep_plane(planes[0], planes[1])
            if prep_band is not None:
                a_b, inv_b, bblk, bnb = prep_band(sum_b, sq_b, tab)
            state_b = (a_p, inv_p, pblk, pnb, a_b, inv_b, bblk, bnb)
            pick = jax.tree_util.tree_map
            if isinstance(fronts, tuple) and fronts[0] == "kbatch":
                # F-framed kernels consume the batched state directly
                psum_b = planes[0] if planes is not None else None
                for f in fronts[1]:
                    state_b = f(sum_b, psum_b, state_b)
                fronts_pf = []
            else:
                fronts_pf = fronts
            outs = []
            for i in range(F):
                # fronts are per-frame (pallas ANY operands don't vmap)
                state = pick(lambda x, i=i: x[i], state_b)
                psum = planes[0][i] if planes is not None else None
                for f in fronts_pf:
                    state = f(sum_b[i], psum, state)
                if stitch is None:
                    outs.append(tail(sum_b[i], tilt_b[i], state))
                else:
                    outs.append(tail(stitch(state)))
            return outs
        inv_nf, alive_b = prep(sum_b, sq_b, tilt_b, tab)
        for f in fronts:
            alive_b = f(sum_b, tilt_b, inv_nf, alive_b)
        return [
            tail(sum_b[i], tilt_b[i], inv_nf[i], alive_b[i])
            for i in range(F)
        ]

    # -- host-side driver ---------------------------------------------------

    def detect_async(self, plan, tab, img, max_det: int):
        """Submit one frame (a few chained async dispatches, no syncs);
        returns device arrays (fidx, fcnt, tail_cnt, overflow)."""
        (canvas, prep, psplit, prep_plane, prep_band, stitch), fronts, \
            tail, (R, Cs) = self.program(plan, max_det)
        sum2d, sq2d, tilt2d = canvas(jnp.asarray(img), tab, R, Cs)
        if prep is None:  # static front: split-layout head
            planes = psplit(sum2d, sq2d) if psplit is not None else None
            a_p = inv_p = a_b = inv_b = None
            pblk = pnb = bblk = bnb = None
            if prep_plane is not None:
                a_p, inv_p, pblk, pnb = prep_plane(planes[0], planes[1])
            if prep_band is not None:
                a_b, inv_b, bblk, bnb = prep_band(sum2d, sq2d, tab)
            state = (a_p, inv_p, pblk, pnb, a_b, inv_b, bblk, bnb)
            psum = planes[0] if planes is not None else None
            for f in fronts:
                state = f(sum2d, psum, state)
            if stitch is None:  # hybrid: split tail consumes the state
                return tail(sum2d, tilt2d, state)
            # all-static: survivors ARE the detections; sparse-extract
            return tail(stitch(state))
        inv_nf, alive = prep(sum2d, sq2d, tilt2d, tab)
        for f in fronts:
            alive = f(sum2d, tilt2d, inv_nf, alive)
        return tail(sum2d, tilt2d, inv_nf, alive)

    def finish(self, out, max_det: int):
        """(fidx, fcnt, tail_cnt, overflow) device tuple → flat window
        indices.

        Raises OverflowError when any static capacity (tail entry or a
        re-compaction step) was exceeded (caller should fall back to the
        adaptive compact engine)."""
        fidx, fcnt, cnt, oflow = (np.asarray(x) for x in out)
        if bool(oflow):
            raise OverflowError(
                f"a static capacity was exceeded: front survivors "
                f"({int(cnt)}) vs tail_n={self.tail_n}, a tail "
                f"re-compaction step, detection rows vs K_ROWS="
                f"{self.K_ROWS}, or raw detections vs max_det"
            )
        if int(fcnt) > max_det:
            raise RuntimeError(
                f"{int(fcnt)} raw detections exceed max_det={max_det}"
            )
        return fidx[: int(fcnt)]
