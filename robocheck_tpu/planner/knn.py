"""Scalable nearest neighbors under the planners' weighted wrapped metric.

The round-3 planners used dense O(n^2) numpy distance sweeps — fine at 4k
samples, hopeless at the 50k-100k roadmaps the north-star workloads (alpha
retry) need. This module provides k-NN and incremental 1-NN against the
configuration metric

    d(a, b) = || (dx, dy, dz, w*wrap(dyaw), w*wrap(dpitch), w*wrap(droll)) ||

via a KD-tree on the 9-D CHORD embedding (x, y, z, w cos/sin of each
angle): chord = 2 sin(|wrap|/2) <= |wrap| <= (pi/2) * chord, so chord
order approximates arc order; candidates are oversampled in chord space
and re-ranked with the exact metric. The incremental 1-NN is EXACT:
exact >= chord, so whenever the last fetched candidate's chord distance
is below the best exact distance found, the (rare) query falls back to a
dense scan. ``conf_knn`` applies the same bound per row (dense rescan of
any row whose k-th exact distance exceeds the candidate horizon's chord
distance), so both queries are EXACT.
"""
from __future__ import annotations

import numpy as np


def _wrap(d: np.ndarray) -> np.ndarray:
    return np.arctan2(np.sin(d), np.cos(d))


def conf_distance(a: np.ndarray, b: np.ndarray,
                  rot_scale: float) -> np.ndarray:
    """Weighted wrapped configuration distance, broadcast over leading
    dims (the planners' exact metric; moved here from prm.py)."""
    d = a - b
    d[..., 3:] = _wrap(d[..., 3:])
    w = np.array([1, 1, 1, rot_scale, rot_scale, rot_scale], np.float64)
    return np.sqrt(((d * w) ** 2).sum(-1))


def chord_embed(confs: np.ndarray, rot_scale: float) -> np.ndarray:
    """[n, 6] -> [n, 9] Euclidean chord embedding."""
    c = confs.astype(np.float64)
    ang = c[:, 3:6]
    return np.concatenate(
        [c[:, 0:3], rot_scale * np.cos(ang), rot_scale * np.sin(ang)],
        axis=1,
    )


def conf_knn(verts: np.ndarray, k: int, rot_scale: float,
             oversample: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """k nearest neighbors of every row among all rows (self excluded).

    Returns (nbrs [n, k] int64, dists [n, k] float64), exact-metric ranked.
    O(n log n) build + O(n * k' log n) query vs the dense O(n^2) sweep.
    """
    n = len(verts)
    k = min(k, n - 1)
    if k <= 0:
        return (np.empty((n, 0), np.int64), np.empty((n, 0), np.float64))
    kq = min(n, oversample * k + 1)
    horizon = np.full(n, np.inf)
    try:
        from scipy.spatial import cKDTree

        emb = chord_embed(verts, rot_scale)
        tree = cKDTree(emb)
        cd, idx = tree.query(emb, k=kq)  # [n, kq], col 0 = self
        if kq < n:
            # Chord radius of the fetched candidate set: any point outside
            # it has chord >= horizon, hence exact >= horizon.
            horizon = cd[:, -1]
    except ImportError:  # dense fallback is exact already (argpartition
        idx = np.empty((n, kq), np.int64)  # on the exact metric)
        row_chunk = max(1, min(n, (1 << 22) // max(n, 1)))
        for s in range(0, n, row_chunk):
            e = min(s + row_chunk, n)
            dd = conf_distance(verts[s:e, None, :].astype(np.float64),
                               verts[None, :, :].astype(np.float64),
                               rot_scale)
            idx[s:e] = np.argpartition(dd, kq - 1, axis=1)[:, :kq]
    cand = idx[:, :]  # includes self; exact rerank removes it
    d = conf_distance(verts[cand].astype(np.float64),
                      verts[:, None, :].astype(np.float64), rot_scale)
    d[cand == np.arange(n)[:, None]] = np.inf
    order = np.argsort(d, axis=1)[:, :k]
    nbrs = np.take_along_axis(cand, order, axis=1)
    dk = np.take_along_axis(d, order, axis=1)
    # Exactness fallback (same argument as IncrementalNearest): a
    # truly-nearer neighbor can hide outside the chord candidate horizon
    # only if the row's k-th exact distance exceeds the horizon's chord
    # distance (chord underestimates arc by up to pi/2, so rotation-heavy
    # rows can crowd the oversampled candidate list). Rescan those rows
    # densely — rare in practice, and it makes conf_knn EXACT.
    bad = np.nonzero(dk[:, -1] > horizon)[0]
    if len(bad):
        dd = conf_distance(verts[bad, None, :].astype(np.float64),
                           verts[None, :, :].astype(np.float64), rot_scale)
        dd[np.arange(len(bad)), bad] = np.inf
        o = np.argsort(dd, axis=1)[:, :k]
        nbrs[bad] = o
        dk[bad] = np.take_along_axis(dd, o, axis=1)
    return nbrs, dk


class IncrementalNearest:
    """Exact incremental 1-NN (batched queries) for RRT-style growing node
    sets: a KD-tree over the chord embedding, rebuilt amortized (when the
    un-indexed tail outgrows a fraction of the tree), with the tail scanned
    densely. Queries oversample in chord space and re-rank with the exact
    metric; exactness holds because exact >= chord, so a dense fallback
    runs for any query whose last fetched candidate's chord distance is
    still below the best exact distance found.
    """

    def __init__(self, rot_scale: float, rebuild_frac: float = 0.25):
        self.rot_scale = rot_scale
        self.rebuild_frac = rebuild_frac
        self._nodes = np.zeros((0, 6), np.float32)
        self._tree = None
        self._tree_n = 0

    def __len__(self) -> int:
        return len(self._nodes)

    def add(self, confs: np.ndarray) -> None:
        confs = np.asarray(confs, np.float32).reshape(-1, 6)
        self._nodes = np.concatenate([self._nodes, confs], axis=0)
        tail = len(self._nodes) - self._tree_n
        if self._tree is None or tail > max(
            256, self.rebuild_frac * self._tree_n
        ):
            try:
                from scipy.spatial import cKDTree
            except ImportError:
                return  # dense-tail-only mode (nearest() scans everything)
            self._tree = cKDTree(chord_embed(self._nodes, self.rot_scale))
            self._tree_n = len(self._nodes)

    @property
    def nodes(self) -> np.ndarray:
        return self._nodes

    def nearest(self, pts: np.ndarray, k_cand: int = 8):
        """(indices [m], exact distances [m]) of the nearest node for each
        query row."""
        pts = np.asarray(pts, np.float32).reshape(-1, 6)
        m = len(pts)
        n = len(self._nodes)
        assert n > 0
        best_i = np.zeros(m, np.int64)
        best_d = np.full(m, np.inf)
        if self._tree is not None:
            kq = min(self._tree_n, k_cand)
            emb = chord_embed(pts, self.rot_scale)
            dd, idx = self._tree.query(emb, k=kq)
            if kq == 1:
                dd = dd[:, None]
                idx = idx[:, None]
            d = conf_distance(self._nodes[idx].astype(np.float64),
                              pts[:, None, :].astype(np.float64),
                              self.rot_scale)
            j = np.argmin(d, axis=1)
            best_d = d[np.arange(m), j]
            best_i = idx[np.arange(m), j].astype(np.int64)
            # Exactness check: every un-fetched node has chord distance
            # >= dd[:, -1], and exact >= chord, so only when
            # dd[:, -1] < best_d could an un-fetched node still beat the
            # best exact distance — dense-scan the tree range for those
            # queries (rare: k_cand=8 almost always covers). An earlier
            # version scaled the bound by pi/2 (the wrong direction) and
            # could return a non-nearest node.
            risky = np.nonzero(
                (kq < self._tree_n) & (dd[:, -1] < best_d)
            )[0]
            for q in risky:
                d_all = conf_distance(
                    self._nodes[: self._tree_n].astype(np.float64),
                    pts[q].astype(np.float64), self.rot_scale)
                jj = int(np.argmin(d_all))
                if d_all[jj] < best_d[q]:
                    best_d[q] = d_all[jj]
                    best_i[q] = jj
        # Dense scan of the un-indexed tail.
        if self._tree_n < n:
            tail = self._nodes[self._tree_n :]
            d = conf_distance(tail[None, :, :].astype(np.float64),
                              pts[:, None, :].astype(np.float64),
                              self.rot_scale)
            j = np.argmin(d, axis=1)
            dtail = d[np.arange(m), j]
            upd = dtail < best_d
            best_d = np.where(upd, dtail, best_d)
            best_i = np.where(upd, self._tree_n + j, best_i)
        return best_i, best_d
