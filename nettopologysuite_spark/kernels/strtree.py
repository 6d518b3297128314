"""Packed STR-tree (Index/Strtree/STRtree.cs:32-663 semantics, array form).

Sort-Tile-Recursive bulk load (``CreateParentBoundables`` :173-183: sort by
envelope center-x → vertical slices → sort center-y → runs of M), stored as
flat numpy level arrays — no node objects, cache-friendly, cheap to pickle
into executors. Queries are vectorized envelope tests per level; kNN is the
Roussopoulos branch-and-bound of ``STRtree.NearestNeighbour`` (:556-660)
over envelope distances.

This is the executor-local index of the north star: built once per
partition (or broadcast pack), probed by whole batches.
"""

from __future__ import annotations

import heapq
import math

import numpy as np

from .batchgeom import _ranges_concat

DEFAULT_NODE_CAPACITY = 10  # STRtree.cs default


class STRtree:
    def __init__(self, envs: np.ndarray, node_capacity: int = DEFAULT_NODE_CAPACITY):
        """envs: (n, 4) [minx, miny, maxx, maxy] item envelopes."""
        self.envs = np.asarray(envs, dtype=np.float64)
        self.cap = node_capacity
        n = len(self.envs)
        self.levels: list[np.ndarray] = []  # per level: (m, 4) node envelopes
        self.children: list[np.ndarray] = []  # per level: (m, 2) child [start, end)
        if n == 0:
            return
        # leaf ordering: STR packing of items (Hilbert in the HPRtree subclass)
        self.item_order = self._pack_order(self.envs)
        cur = self.envs[self.item_order]
        while True:
            m = len(cur)
            groups = -(-m // self.cap)
            node_env = np.empty((groups, 4))
            node_child = np.empty((groups, 2), dtype=np.int64)
            for gi in range(groups):
                lo = gi * self.cap
                hi = min(m, lo + self.cap)
                node_env[gi, 0] = cur[lo:hi, 0].min()
                node_env[gi, 1] = cur[lo:hi, 1].min()
                node_env[gi, 2] = cur[lo:hi, 2].max()
                node_env[gi, 3] = cur[lo:hi, 3].max()
                node_child[gi] = (lo, hi)
            if groups > 1:
                # store this level in ITS OWN pack order so the level above
                # groups contiguous runs; child ranges ride along as payload
                perm = self._pack_order(node_env)
                node_env = node_env[perm]
                node_child = node_child[perm]
            self.levels.append(node_env)
            self.children.append(node_child)
            if groups == 1:
                break
            cur = node_env

    def _str_order(self, envs: np.ndarray) -> np.ndarray:
        n = len(envs)
        cx = (envs[:, 0] + envs[:, 2]) * 0.5
        cy = (envs[:, 1] + envs[:, 3]) * 0.5
        slice_count = int(math.ceil(math.sqrt(-(-n // self.cap))))
        by_x = np.argsort(cx, kind="stable")
        slice_cap = slice_count * self.cap
        order = []
        for s in range(0, n, slice_cap):
            sl = by_x[s : s + slice_cap]
            order.append(sl[np.argsort(cy[sl], kind="stable")])
        return np.concatenate(order)

    # -- queries ---------------------------------------------------------
    def query(self, minx: float, miny: float, maxx: float, maxy: float) -> np.ndarray:
        """Item indices (original order) whose envelopes intersect the box."""
        if not self.levels:
            return np.empty(0, dtype=np.int64)
        level = len(self.levels) - 1
        nodes = [0]
        while level >= 0:
            env = self.levels[level]
            ch = self.children[level]
            nxt: list[int] = []
            for ni in nodes:
                e = env[ni]
                if e[0] > maxx or e[2] < minx or e[1] > maxy or e[3] < miny:
                    continue
                nxt.extend(range(int(ch[ni, 0]), int(ch[ni, 1])))
            nodes = nxt
            level -= 1
        if not nodes:
            return np.empty(0, dtype=np.int64)
        idx = self.item_order[np.asarray(nodes, dtype=np.int64)]
        e = self.envs[idx]
        hit = ~((e[:, 0] > maxx) | (e[:, 2] < minx) | (e[:, 1] > maxy) | (e[:, 3] < miny))
        return idx[hit]

    def query_batch(self, boxes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Bulk envelope query: all query boxes descend the tree together.

        boxes: (m, 4) [minx, miny, maxx, maxy]. Returns (query_idx, item_idx)
        pairs for every item envelope intersecting its query box — the
        vectorized form of ``query`` (one numpy pass per tree level instead
        of a Python loop per query; ``Index/Strtree/STRtree.cs:238`` Query
        semantics, batched)."""
        boxes = np.asarray(boxes, dtype=np.float64)
        m = len(boxes)
        if not self.levels or m == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        # frontier: (query, node) pairs at the current level
        q = np.arange(m, dtype=np.int64)
        node = np.zeros(m, dtype=np.int64)
        level = len(self.levels) - 1
        while level >= 0:
            env = self.levels[level]
            e = env[node]
            b = boxes[q]
            hit = ~(
                (e[:, 0] > b[:, 2]) | (e[:, 2] < b[:, 0])
                | (e[:, 1] > b[:, 3]) | (e[:, 3] < b[:, 1])
            )
            q = q[hit]
            node = node[hit]
            if len(q) == 0:
                return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
            ch = self.children[level]
            starts = ch[node, 0]
            counts = ch[node, 1] - starts
            node, owner = _ranges_concat(starts, counts)
            q = q[owner]
            level -= 1
        idx = self.item_order[node]
        e = self.envs[idx]
        b = boxes[q]
        hit = ~(
            (e[:, 0] > b[:, 2]) | (e[:, 2] < b[:, 0])
            | (e[:, 1] > b[:, 3]) | (e[:, 3] < b[:, 1])
        )
        return q[hit], idx[hit]

    def _pack_order(self, envs: np.ndarray) -> np.ndarray:
        return self._str_order(envs)

    @staticmethod
    def _env_dist2(e: np.ndarray, x: float, y: float) -> float:
        dx = max(e[0] - x, 0.0, x - e[2])
        dy = max(e[1] - y, 0.0, y - e[3])
        return dx * dx + dy * dy

    def nearest(self, x: float, y: float, k: int = 1, item_dist=None) -> list[int]:
        """k nearest item indices by envelope distance (or exact item_dist
        callback) — Roussopoulos branch-and-bound priority queue.

        ``item_dist(item, x, y)`` MUST return the SQUARED exact distance:
        heap ordering and the branch-and-bound cutoff compare it against
        squared envelope distances, so a non-squared callback would break
        pruning. (Squared envelope distance is always a lower bound on
        squared exact distance, so the cutoff stays admissible.)"""
        if not self.levels:
            return []
        heap: list[tuple[float, int, int, int]] = []  # (dist, tiebreak, level, node)
        tie = 0
        top = len(self.levels) - 1
        heapq.heappush(heap, (self._env_dist2(self.levels[top][0], x, y), tie, top + 1, 0))
        best: list[tuple[float, int]] = []
        while heap:
            d, _t, lvl, ni = heapq.heappop(heap)
            if len(best) >= k and d > best[-1][0]:
                break
            if lvl == 0:
                item = int(ni)
                dist = d if item_dist is None else item_dist(item, x, y)
                best.append((dist, item))
                best.sort()
                best = best[:k]
                continue
            ch = self.children[lvl - 1]
            if lvl - 1 == 0:
                # children are items
                for c in range(int(ch[ni, 0]), int(ch[ni, 1])):
                    item = int(self.item_order[c])
                    de = self._env_dist2(self.envs[item], x, y)
                    tie += 1
                    heapq.heappush(heap, (de, tie, 0, item))
            else:
                child_env = self.levels[lvl - 2]  # children live one level down
                for c in range(int(ch[ni, 0]), int(ch[ni, 1])):
                    tie += 1
                    heapq.heappush(
                        heap, (self._env_dist2(child_env[c], x, y), tie, lvl - 1, c)
                    )
        return [i for _d, i in best]


class HPRtree(STRtree):
    """Hilbert-packed static R-tree (Index/HPRtree/HPRtree.cs:1-437
    semantics): identical query/kNN machinery to the packed STRtree, with
    the packing order replaced by the Hilbert code of each envelope center
    over the level's own extent (HilbertEncoder.cs:7-27 quantizes centers
    to a 2^level grid of the total bounds). Space-filling packing gives
    slightly better leaf locality for clustered data and makes the build a
    single O(n log n) sort — no slice passes."""

    HILBERT_LEVEL = 12  # 2^12 × 2^12 quantization grid (HilbertEncoder: 16)

    def _pack_order(self, envs: np.ndarray) -> np.ndarray:
        from .cells import hilbert_encode

        cx = (envs[:, 0] + envs[:, 2]) * 0.5
        cy = (envs[:, 1] + envs[:, 3]) * 0.5
        n = 1 << self.HILBERT_LEVEL
        spanx = max(cx.max() - cx.min(), 1e-300)
        spany = max(cy.max() - cy.min(), 1e-300)
        ix = np.minimum(((cx - cx.min()) / spanx * n).astype(np.int64), n - 1)
        iy = np.minimum(((cy - cy.min()) / spany * n).astype(np.int64), n - 1)
        return np.argsort(hilbert_encode(ix, iy, self.HILBERT_LEVEL), kind="stable")
