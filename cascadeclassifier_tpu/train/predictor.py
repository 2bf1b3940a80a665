"""Training-side cascade predictor for sample filtering.

Mirrors CvCascadeClassifier::predict → CvCascadeBoost::predict
(cascadeclassifier.cpp:297-306, boost.cpp:461-477): training-evaluator
feature semantics, tree walk with ``val <= c`` (ordered) or subset-bit
(categorical), stage rejection at ``sum < threshold − 1e-5``.

Evaluates whole window batches at once: the features used by the trained
stages (a few hundred) are computed for the entire batch via one MXU
matmul, then the small trees are walked vectorized in numpy.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

CV_THRESHOLD_EPS = 1e-5


@functools.partial(jax.jit, static_argnames=("wh", "ww"))
def _extract_windows(img_pad, pxs, pys, wh, ww):
    """(n_pad,) grid positions → (n_pad, wh, ww) uint8 windows, on device.

    Device-side replacement for NegReader's host crop loop: one small
    image upload serves a whole (image, scale) mining level. Positions
    are bucket-padded; the caller tracks true counts."""
    rows = pys[:, None] + jnp.arange(wh, dtype=jnp.int32)
    cols = pxs[:, None] + jnp.arange(ww, dtype=jnp.int32)
    return img_pad[rows[:, :, None], cols[:, None, :]]


@functools.partial(jax.jit, static_argnames=("wh", "ww"))
def _extract_windows_multi(img_stack, ids, pxs, pys, wh, ww):
    """Multi-level window gather: (L, H, W) stacked level images +
    per-window level ids → (n_pad, wh, ww) uint8 windows."""
    rows = pys[:, None] + jnp.arange(wh, dtype=jnp.int32)
    cols = pxs[:, None] + jnp.arange(ww, dtype=jnp.int32)
    return img_stack[ids[:, None, None], rows[:, :, None], cols[:, None, :]]


class CascadePredictor:
    """Predicts accept/reject of the current (partial) cascade on batches."""

    # device image-cache entries (levels + stacks) before a full evict
    IMG_CACHE_CAP = 2048

    def __init__(self, evaluator_factory, stages=None):
        """evaluator_factory: () → fresh train evaluator over the full
        catalog (set_samples + values_for the used variables)."""
        self._make_ev = evaluator_factory
        self.stages = list(stages or [])

    def add_stage(self, stage):
        self.stages.append(stage)

    def _used_vars(self):
        used = set()
        for s in self.stages:
            for t in s.trees:
                used.update(int(v) for v in t.feature_idx)
        return sorted(used)

    def _stump_tables(self, var_pos, categorical):
        """Flattened per-tree arrays for the device walk (stump-only
        cascades — the trained default); None when any tree is deep."""
        idxs, thrs, lls, rrs, subs, bounds, sthr = [], [], [], [], [], [0], []
        for stage in self.stages:
            for tree in stage.trees:
                if tree.num_nodes != 1:
                    return None
                idxs.append(var_pos[int(tree.feature_idx[0])])
                if categorical:
                    subs.append(np.asarray(tree.subsets[0], np.int32))
                    thrs.append(0.0)
                else:
                    thrs.append(float(tree.threshold[0]))
                ll = (
                    tree.leaf_values[-int(tree.left[0])]
                    if tree.left[0] <= 0 else 0.0
                )
                rr = (
                    tree.leaf_values[-int(tree.right[0])]
                    if tree.right[0] <= 0 else 0.0
                )
                lls.append(float(ll))
                rrs.append(float(rr))
            bounds.append(len(idxs))
            sthr.append(float(stage.threshold))
        return (
            np.asarray(idxs, np.int32), np.asarray(thrs, np.float32),
            np.asarray(lls, np.float32), np.asarray(rrs, np.float32),
            np.stack(subs) if subs else None, bounds, sthr,
        )

    def _device_predict(self, vals_dev, tables, m_pad):
        """All-stump cascade walk on device: one fetch per batch instead
        of fetching the (K, m) value matrix (the mining hot path —
        late-stage hard-negative mining pushes 10^8 windows)."""
        import jax

        idxs, thrs, lls, rrs, subs, bounds, sthr = tables
        key = ("stump", len(bounds), len(idxs), m_pad)
        if key not in self._jit_cache:
            def run(vals, idxs, thrs, lls, rrs, subs):
                with jax.enable_x64(True):
                    tv = vals[idxs]  # (T, m) gather over small K axis
                    if subs is not None:
                        code = tv.astype(jnp.int32)
                        word = jnp.zeros_like(code)
                        wsel = code >> 5
                        for wi in range(8):
                            word = jnp.where(
                                wsel == wi, subs[:, wi : wi + 1], word
                            )
                        bit = (word >> (code & 31)) & 1
                        leaf = jnp.where(
                            bit != 0, lls[:, None], rrs[:, None]
                        ).astype(jnp.float64)
                    else:
                        leaf = jnp.where(
                            tv <= thrs[:, None], lls[:, None], rrs[:, None]
                        ).astype(jnp.float64)
                    ok = jnp.ones(leaf.shape[1], bool)
                    for si in range(len(bounds) - 1):
                        ssum = jnp.sum(leaf[bounds[si] : bounds[si + 1]],
                                       axis=0)
                        ok = ok & ~(
                            ssum < jnp.float64(sthr[si]) - CV_THRESHOLD_EPS
                        )
                    return ok

            self._jit_cache[key] = jax.jit(run)
        # device-resident table cache: re-uploading the 5 small arrays on
        # every call costs a host round trip each through the tunnel
        tkey = ("tables", len(self.stages), len(idxs))
        if tkey not in self._jit_cache:
            self._jit_cache[tkey] = (
                jnp.asarray(idxs), jnp.asarray(thrs), jnp.asarray(lls),
                jnp.asarray(rrs),
                None if subs is None else jnp.asarray(subs),
            )
        ti, tt, tl, tr_, ts = self._jit_cache[tkey]
        return self._jit_cache[key](vals_dev, ti, tt, tl, tr_, ts)

    def extract_level(self, img: np.ndarray, positions: np.ndarray,
                      ww: int, wh: int, cache_key=None):
        """One mining level: upload the scaled background once, gather
        its (bucket-padded) window grid on device. Async dispatch — no
        sync; pair with predict_parts.

        cache_key: optional hashable identity of the scaled background
        (e.g. (bg index, scale)): the mining schedule revisits the same
        (image, scale) levels every round-robin pass, so the device
        upload is cached — late-stage mining otherwise re-ships the
        same few MB thousands of times through the host link."""
        H, W = img.shape
        if not hasattr(self, "_img_cache"):
            self._img_cache = {}
        img_dev = (
            self._img_cache.get(cache_key) if cache_key is not None else None
        )
        if img_dev is None:
            img_pad = img
            Hp, Wp = -(-H // 128) * 128, -(-W // 128) * 128
            if (Hp, Wp) != (H, W):
                img_pad = np.zeros((Hp, Wp), np.uint8)
                img_pad[:H, :W] = img
            img_dev = jnp.asarray(img_pad)
            if cache_key is not None:
                if len(self._img_cache) > 512:
                    self._img_cache.clear()
                self._img_cache[cache_key] = img_dev
        n = len(positions)
        # power-of-2 buckets bound the number of compiled gather
        # programs to ~log2(max level size) per canvas bucket
        n_pad = max(256, 1 << int(np.ceil(np.log2(max(n, 2)))))
        pxs = np.zeros(n_pad, np.int32)
        pys = np.zeros(n_pad, np.int32)
        pxs[:n] = positions[:, 0]
        pys[:n] = positions[:, 1]
        return _extract_windows(
            img_dev, jnp.asarray(pxs), jnp.asarray(pys), wh, ww
        )

    def predict_levels(self, levels, ww: int, wh: int):
        """Whole-superbatch mining predict: ONE image stack, ONE window
        gather, ONE predict chain, ONE fetch.

        levels: list of (img, positions, cache_key) mining levels.
        Returns per-level (len(positions),) bool accept masks.

        Per-level extraction dispatches (~1.5 ms each through the host
        link) and per-superbatch fixed predict latency (~250 ms) made
        mining cost ~10-20 µs per candidate window; stacking every
        level image of the superbatch into one (L, H, W) device array
        amortizes all of it to one dispatch chain (~0.6 µs/window) —
        the late-stage hard-negative wall consumes 10^8-10^9 windows
        (fillPassedSamples, cascadeclassifier.cpp:329-357)."""
        if not hasattr(self, "_img_cache"):
            self._img_cache = {}
        # evict BEFORE populating: clearing inside the populate loop
        # would drop this superbatch's own earlier entries
        if len(self._img_cache) > self.IMG_CACHE_CAP:
            self._img_cache.clear()
        # common padded geometry (levels are ≤ the source image)
        Hp = max(-(-lv[0].shape[0] // 128) * 128 for lv in levels)
        Wp = max(-(-lv[0].shape[1] // 128) * 128 for lv in levels)
        # deduplicate: the round-robin schedule revisits the same few
        # dozen (bg, scale) levels every pass, so a superbatch of 1000+
        # levels holds ~72 DISTINCT images — stacking per level would
        # ship a 1000-operand stack program every superbatch. Window ids
        # index the unique stack, and the stacked device array itself is
        # cached on its key tuple (stable after the first full pass).
        first = {}
        for img, _pos, key in levels:
            if key not in first:
                first[key] = img
        uniq = sorted(first.items())  # key order → stable stack cache key
        uniq = [(img, key) for key, img in uniq]
        uid = {key: i for i, (_img, key) in enumerate(uniq)}
        for img, key in uniq:
            ck = (key, Hp, Wp)
            if ck not in self._img_cache:
                pad = np.zeros((Hp, Wp), np.uint8)
                pad[: img.shape[0], : img.shape[1]] = img
                self._img_cache[ck] = jnp.asarray(pad)
        L = len(uniq)
        L_pad = 1 << int(np.ceil(np.log2(max(L, 1))))
        zk = ("zero", Hp, Wp)
        if L_pad != L and zk not in self._img_cache:
            self._img_cache[zk] = jnp.zeros((Hp, Wp), np.uint8)
        skey = ("stack", tuple(k for _i, k in uniq), Hp, Wp)
        stack = self._img_cache.get(skey)
        if stack is None:
            # NB: build the pad list lazily — `[cache[zk]] * 0` would
            # still evaluate the lookup, and zk is only inserted when
            # L_pad != L (a power-of-two unique count has no pad)
            pad_imgs = (
                [self._img_cache[zk]] * (L_pad - L) if L_pad != L else []
            )
            stack = jnp.stack(
                [self._img_cache[(k, Hp, Wp)] for _i, k in uniq]
                + pad_imgs
            )
            self._img_cache[skey] = stack
        counts = [len(lv[1]) for lv in levels]
        n = int(np.sum(counts))
        n_pad = max(256, 1 << int(np.ceil(np.log2(max(n, 2)))))
        pxs = np.zeros(n_pad, np.int32)
        pys = np.zeros(n_pad, np.int32)
        ids = np.zeros(n_pad, np.int32)
        off = 0
        for li, (_img, pos, key) in enumerate(levels):
            c = len(pos)
            pxs[off : off + c] = pos[:, 0]
            pys[off : off + c] = pos[:, 1]
            ids[off : off + c] = uid[key]
            off += c
        from cascadeclassifier_tpu.utils.profiling import timed

        with timed("mine_extract"):
            win = _extract_windows_multi(
                stack, jnp.asarray(ids), jnp.asarray(pxs), jnp.asarray(pys),
                wh, ww,
            )
        if not self.stages:
            return [np.ones(c, bool) for c in counts]
        with timed("mine_values"):
            ok_dev = self._predict_device(win)
        with timed("mine_fetch"):
            ok = np.asarray(ok_dev)  # one fetch
        out, off = [], 0
        for c in counts:
            out.append(ok[off : off + c])
            off += c
        return out

    def predict_parts(self, parts, counts):
        """parts: device window stacks from extract_level (bucket-padded);
        counts: their true window counts. Per-part bucket-shaped predicts
        + ONE packed fetch; returns per-part (counts[i],) bool arrays.

        Every program shape here is bucket-bounded: an earlier design
        concatenated the parts TRIMMED to their true counts, so each
        superbatch's unique size combination recompiled the concat+pad
        program on the remote XLA service (~2.5 s per 16K-window
        superbatch — the dominant mining cost at late stages)."""
        if not self.stages:
            return [np.ones(c, bool) for c in counts]
        # group parts by bucket shape and predict each group in ONE
        # dispatch chain: per-part predicts cost ~30 ms each in pure
        # dispatch/upload latency through the host link (~2.3 s per
        # 64-part superbatch); grouped, a superbatch is ~4 chains
        from collections import defaultdict

        groups = defaultdict(list)
        for i, p in enumerate(parts):
            groups[int(p.shape[0])].append(i)
        if not hasattr(self, "_zero_parts"):
            self._zero_parts = {}
        ok_rows = [None] * len(parts)
        for n_pad, gidx in groups.items():
            g = len(gidx)
            g_pad = 1 << int(np.ceil(np.log2(max(g, 1))))
            shape = tuple(parts[gidx[0]].shape)
            if g_pad != g and shape not in self._zero_parts:
                self._zero_parts[shape] = jnp.zeros(
                    shape, parts[gidx[0]].dtype
                )
            plist = [parts[i] for i in gidx]
            plist += [self._zero_parts[shape]] * (g_pad - g)
            x = jnp.concatenate(plist, axis=0)  # (g_pad*n_pad, h, w)
            ok = np.asarray(  # one fetch per shape group (~4/superbatch)
                self._predict_device(x)
            ).reshape(g_pad, n_pad)
            for j, i in enumerate(gidx):
                ok_rows[i] = ok[j]
        return [ok_rows[i][:c] for i, c in enumerate(counts)]

    def _predict_device(self, samples):
        """(m_bucket, h, w) device uint8 → (m_bucket,) device bool (padding
        windows evaluate too; callers slice by true count)."""
        used = self._used_vars()
        k = len(used)
        k_pad = max(16, -(-k // 16) * 16)
        used_padded = used + [used[0]] * (k_pad - k)
        ev = self._make_ev()
        ev.set_samples(samples)
        var_pos = {v: i for i, v in enumerate(used)}
        if not hasattr(self, "_jit_cache"):
            self._jit_cache = {}
        tables = self._stump_tables(var_pos, ev.maxCatCount > 0)
        if tables is None:
            return jnp.asarray(self.predict_batch(np.asarray(samples)))
        vals_dev = ev.values_for_vars(used_padded)
        return self._device_predict(
            vals_dev[:k], tables, int(samples.shape[0])
        )

    def predict_batch(self, samples: np.ndarray) -> np.ndarray:
        """samples: (m, h, w) uint8 → (m,) bool — True when every stage
        accepts (1 == reference predict)."""
        m = samples.shape[0]
        if not self.stages or m == 0:
            return np.ones(m, bool)
        # pad to a bucketed batch so mining reuses compiled programs;
        # device batches pad on device (np.concatenate on a jax array
        # silently round-trips the whole window batch through the host)
        m_pad = max(256, -(-m // 256) * 256)
        if m_pad != m:
            xp = jnp if isinstance(samples, jax.Array) else np
            samples = xp.concatenate(
                [samples, xp.zeros((m_pad - m,) + samples.shape[1:],
                                   samples.dtype)]
            )
        used = self._used_vars()
        # pad the used-variable list to a bucket so the number of trained
        # stages doesn't trigger recompiles of the evaluation program
        k = len(used)
        k_pad = max(16, -(-k // 16) * 16)
        used_padded = used + [used[0]] * (k_pad - k)
        ev = self._make_ev()
        ev.set_samples(samples)
        var_pos = {v: i for i, v in enumerate(used)}
        if not hasattr(self, "_jit_cache"):
            self._jit_cache = {}
        tables = self._stump_tables(var_pos, ev.maxCatCount > 0)
        if tables is not None:
            vals_dev = ev.values_for_vars(used_padded)  # stays on device
            ok = self._device_predict(vals_dev[:k], tables, m_pad)
            return np.asarray(ok)[:m]
        vals = np.asarray(ev.values_for_vars(used_padded))[:k, :m]  # (K, m)

        ok = np.ones(m, bool)
        categorical = ev.maxCatCount > 0
        for stage in self.stages:
            sums = np.zeros(m, np.float64)
            for tree in stage.trees:
                node = np.zeros(m, np.int32)
                out = np.zeros(m, np.float64)
                active = np.ones(m, bool)
                for _ in range(tree.num_nodes + 1):
                    if not active.any():
                        break
                    for ni in np.unique(node[active]):
                        sel = active & (node == ni)
                        v = vals[var_pos[int(tree.feature_idx[ni])]][sel]
                        if categorical:
                            code = v.astype(np.int64)
                            bit = (
                                tree.subsets[ni].astype(np.uint32)[code >> 5]
                                >> (code & 31)
                            ) & 1
                            go_left = bit != 0
                        else:
                            go_left = v <= tree.threshold[ni]
                        child = np.where(go_left, tree.left[ni], tree.right[ni])
                        idx = np.nonzero(sel)[0]
                        leaf = child <= 0
                        out[idx[leaf]] = tree.leaf_values[-child[leaf]]
                        active[idx[leaf]] = False
                        node[idx[~leaf]] = child[~leaf]
                sums += out
            ok &= ~(sums < stage.threshold - CV_THRESHOLD_EPS)
        return ok
