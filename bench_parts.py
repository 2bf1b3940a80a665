"""Per-phase detection timing + roofline table (VERDICT r3 #8).

Reproduces the BENCHMARKS.md phase breakdown on the real chip with one
command:

    python bench_parts.py            # per-program ms at 1080p
    BENCH_H=480 BENCH_W=640 python bench_parts.py

For every chained program of the fused engine (canvas, plane split,
prep_plane, prep_band, each static-front chunk, survivor extraction,
tail) it reports:
  - steady-state ms/dispatch (N chained dispatches ending in ONE tiny
    fetch; plain block_until_ready does not synchronize through the
    axon tunnel, and the single fetch's ~28 ms round trip is subtracted
    via a measured empty-fetch baseline)
  - HBM bytes touched (sum of operand + result sizes — a lower bound on
    traffic, ignoring XLA temporaries)
  - roofline ms at the v5e's ~819 GB/s HBM bandwidth and the achieved %

The "% roof" column is what makes "this phase is at speed-of-light"
claims auditable (VERDICT r3 weak #1).
"""

import json
import os
import time

import numpy as np

HBM_GBPS = float(os.environ.get("CCTPU_HBM_GBPS", "819"))


def _nbytes(tree):
    import jax

    return sum(
        x.size * x.dtype.itemsize
        for x in jax.tree_util.tree_leaves(tree)
        if hasattr(x, "dtype")
    )


class Timer:
    """Steady-state per-dispatch timing through the tunnel."""

    def __init__(self, iters=None):
        self.iters = int(os.environ.get("BENCH_PART_ITERS", iters or 30))
        self.rows = []
        # measured cost of the sync fetch itself (scalar round trip)
        import jax.numpy as jnp

        z = jnp.zeros((), jnp.int32) + 1
        np.asarray(z)
        t0 = time.time()
        for _ in range(5):
            np.asarray(z + 1)
        self.fetch_s = (time.time() - t0) / 5

    def time(self, name, fn, *args, out_bytes=0):
        out = fn(*args)  # warm (compile)
        self._sync(out)
        t0 = time.time()
        for _ in range(self.iters):
            out = fn(*args)
        self._sync(out)
        dt = (time.time() - t0 - self.fetch_s) / self.iters
        bts = _nbytes(args) + (out_bytes or _nbytes(out))
        roof = bts / (HBM_GBPS * 1e9)
        self.rows.append(
            dict(
                phase=name,
                ms=round(dt * 1e3, 2),
                mb=round(bts / 1e6, 1),
                roof_ms=round(roof * 1e3, 3),
                pct_roof=round(100 * roof / dt, 1) if dt > 0 else 0.0,
            )
        )
        return out

    @staticmethod
    def _sync(out):
        import jax

        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf.reshape(-1)[:1])

    def report(self):
        w = max(len(r["phase"]) for r in self.rows)
        print(
            f"{'phase'.ljust(w)}  {'ms':>8}  {'MB':>8}  {'roof ms':>8} "
            f" {'% roof':>7}"
        )
        tot = 0.0
        for r in self.rows:
            tot += r["ms"]
            print(
                f"{r['phase'].ljust(w)}  {r['ms']:>8.2f}  {r['mb']:>8.1f} "
                f" {r['roof_ms']:>8.3f}  {r['pct_roof']:>7.1f}"
            )
        print(f"{'TOTAL (sum of parts)'.ljust(w)}  {tot:>8.2f}")
        print(json.dumps({"parts": self.rows, "total_ms": round(tot, 2)}))


def main():
    import jax
    import jax.numpy as jnp

    from bench import synth_frame
    from cascadeclassifier_tpu.detect.detector import (
        TPUDetector,
        plan_tables,
    )
    from cascadeclassifier_tpu.detect.pyramid import build_plan
    from cascadeclassifier_tpu.models.xml_io import read_cascade_xml

    xml = os.environ.get(
        "BENCH_XML",
        "/usr/share/opencv4/haarcascades/haarcascade_frontalface_alt.xml",
    )
    model = read_cascade_xml(xml)
    det = TPUDetector(model, exact=False, engine="fused")
    eng = det._fused
    bh = int(os.environ.get("BENCH_H", "1080"))
    bw = int(os.environ.get("BENCH_W", "1920"))
    img = synth_frame(0, bh, bw)
    max_det = 1 << 14
    plan = build_plan(bw, bh, det.packed.win_w, det.packed.win_h, 1.1,
                      pack_band=eng.wants_packed_plan())
    tab = plan_tables(plan)
    (canvas, prep, psplit, prep_plane, prep_band, stitch), fronts, tail, (
        R,
        Cs,
    ) = eng.program(plan, max_det)

    print(
        f"# {bw}x{bh} canvas {plan.canvas_h}x{plan.canvas_w} "
        f"({plan.canvas_h * plan.canvas_w / 1e6:.1f}M cells), "
        f"n_dense={eng.n_dense}, tail_n={eng._parts['tail_n']}, "
        f"front chunks={len(fronts)}"
    )
    t = Timer()
    dimg = jnp.asarray(img)
    np.asarray(dimg.reshape(-1)[:1])

    outs = t.time("canvas", canvas, dimg, tab, R, Cs)
    sum2d, sq2d, tilt2d = outs
    if prep is None:
        planes = None
        if psplit is not None:
            planes = t.time("psplit", psplit, sum2d, sq2d)
        a_p = inv_p = a_b = inv_b = None
        pblk = pnb = bblk = bnb = None
        if prep_plane is not None:
            a_p, inv_p, pblk, pnb = t.time(
                "prep_plane", prep_plane, planes[0], planes[1]
            )
        if prep_band is not None:
            a_b, inv_b, bblk, bnb = t.time(
                "prep_band", prep_band, sum2d, sq2d, tab
            )
        state = (a_p, inv_p, pblk, pnb, a_b, inv_b, bblk, bnb)
        psum = planes[0] if planes is not None else None
        for i, f in enumerate(fronts):
            state = t.time(f"front[{i}]", f, sum2d, psum, state)
        if stitch is None:
            out = t.time("tail(split)", tail, sum2d, tilt2d, state)
        else:
            alive = t.time("stitch", stitch, state)
            out = t.time("tail(sparse)", tail, alive)
    else:
        inv_nf, alive = t.time("prep", prep, sum2d, sq2d, tilt2d, tab)
        for i, f in enumerate(fronts):
            alive = t.time(f"front[{i}]", f, sum2d, tilt2d, inv_nf, alive)
        out = t.time("tail", tail, sum2d, tilt2d, inv_nf, alive)

    fidx, fcnt, cnt, oflow = (np.asarray(x) for x in out)
    print(
        f"# front survivors={int(cnt)}, detections={int(fcnt)}, "
        f"overflow={bool(oflow)}"
    )

    # sub-parts of the split tail (per-piece timing of what tail(split)
    # runs as one program; sums can exceed the fused time)
    p = eng._parts
    want_parts = os.environ.get("BENCH_TAIL_PARTS", "1") == "1"
    if want_parts and (p["nz_plane"] or p["nz_comb"]):
        a_p, inv_p, a_b, inv_b = state[0], state[1], state[4], state[5]
        g = p["geom"]
        tail_n = p["tail_n"]
        pg_h2, pg_w2 = g["pg"]
        bm = a_b[: g["out_h"] - g["row_lo"], : g["out_w"]] != 0
        if p["nz_comb"] is not None:
            w_u = max(g["out_w"], pg_w2)
            pm = jnp.zeros(
                (pg_h2, w_u), bool
            ).at[:, :pg_w2].set(a_p != 0)
            bm_w = jnp.zeros(
                (bm.shape[0], w_u), bool
            ).at[:, : g["out_w"]].set(bm)
            comb = jnp.concatenate([pm, bm_w], 0)
            idx_u, _ = t.time("  nz_comb", p["nz_comb"], comb)
            ru = idx_u // w_u
            r = jnp.where(idx_u < pg_h2 * w_u, ru * 2,
                          g["row_lo"] + ru - pg_h2)
            c = jnp.where(idx_u < pg_h2 * w_u, (idx_u % w_u) * 2,
                          idx_u % w_u)
            iv = inv_p.reshape(-1)[jnp.zeros_like(idx_u)]
        else:
            idxp, _ = t.time("  nz_plane", p["nz_plane"], a_p != 0)
            t.time("  nz_band", p["nz_band"], bm)
            r = (idxp // pg_w2) * 2
            c = (idxp % pg_w2) * 2
            iv = inv_p.reshape(-1)[idxp]
        cntd = jnp.sum(a_p != 0, dtype=jnp.int32) + jnp.sum(
            bm, dtype=jnp.int32
        )
        ps = t.time("  patchify", p["ppatch"], sum2d, r, c, cntd)
        t.time("  tail_fn", p["tail_fn"], ps, ps, iv, cntd)
    t.report()


if __name__ == "__main__":
    main()
