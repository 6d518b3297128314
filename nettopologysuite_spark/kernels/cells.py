"""Space-filling-curve tiling: the engine's H3/S2 analog.

Cell identity is a row-major grid id over a fixed job extent — chosen so the
assignment is a pure arithmetic projection that Catalyst/DuckDB can also
evaluate (the correctness oracle recomputes it in ANSI SQL). Morton and
Hilbert codes (mirroring ``Shape/Fractal/MortonCode.cs:44-131`` and
``HilbertCode.cs:42-199``) are provided for *ordering* — writing data
sorted by curve position clusters spatial neighbors into the same file /
row-group, which is what makes min-max pruning effective at 100 TB — while
the row-major id stays the join key.

All functions are vectorized over numpy arrays; nothing here touches Spark.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

MAX_LEVEL = 16  # HilbertCode.cs:47 MaxLevel


@dataclass(frozen=True)
class Grid:
    """Tiling of extent [minx, maxx) × [miny, maxy) into 2^level per side."""

    minx: float = 0.0
    miny: float = 0.0
    maxx: float = 100.0
    maxy: float = 100.0
    level: int = 6

    @property
    def n(self) -> int:
        return 1 << self.level

    @property
    def cell_w(self) -> float:
        return (self.maxx - self.minx) / self.n

    @property
    def cell_h(self) -> float:
        return (self.maxy - self.miny) / self.n

    # -- point → cell ---------------------------------------------------
    def cell_ids(self, x: np.ndarray, y: np.ndarray) -> np.ndarray:
        """Row-major cell id: iy * n + ix, clamped to the grid."""
        ix = self.col_of(x)
        iy = self.row_of(y)
        return iy * np.int64(self.n) + ix

    def col_of(self, x: np.ndarray) -> np.ndarray:
        ix = np.floor((np.asarray(x, dtype=np.float64) - self.minx) / self.cell_w).astype(np.int64)
        return np.clip(ix, 0, self.n - 1)

    def row_of(self, y: np.ndarray) -> np.ndarray:
        iy = np.floor((np.asarray(y, dtype=np.float64) - self.miny) / self.cell_h).astype(np.int64)
        return np.clip(iy, 0, self.n - 1)

    # -- envelope → covering cells --------------------------------------
    def cover_envelope(self, minx: float, miny: float, maxx: float, maxy: float) -> np.ndarray:
        """All cell ids whose tile intersects the (closed) envelope."""
        c0 = int(self.col_of(np.array([minx]))[0])
        c1 = int(self.col_of(np.array([maxx]))[0])
        r0 = int(self.row_of(np.array([miny]))[0])
        r1 = int(self.row_of(np.array([maxy]))[0])
        cols = np.arange(c0, c1 + 1, dtype=np.int64)
        rows = np.arange(r0, r1 + 1, dtype=np.int64)
        return (rows[:, None] * np.int64(self.n) + cols[None, :]).ravel()

    def cell_bounds(self, cell: np.ndarray) -> np.ndarray:
        """(n, 4) [minx, miny, maxx, maxy] of each cell id."""
        cell = np.asarray(cell, dtype=np.int64)
        iy, ix = np.divmod(cell, np.int64(self.n))
        out = np.empty((len(cell), 4), dtype=np.float64)
        out[:, 0] = self.minx + ix * self.cell_w
        out[:, 1] = self.miny + iy * self.cell_h
        out[:, 2] = out[:, 0] + self.cell_w
        out[:, 3] = out[:, 1] + self.cell_h
        return out

    # -- SQL projection of the same assignment (for oracles / pushdown) --
    def sql_cell_expr(self, x_expr: str, y_expr: str) -> str:
        """ANSI-SQL expression computing exactly ``cell_ids`` (sans clamp —
        callers guarantee in-extent inputs)."""
        n = self.n

        def d(v: float) -> str:
            # integer-valued floats as exact ints, else a DOUBLE-cast ratio of
            # exact decimals (cell sizes are dyadic → the division is exact);
            # never emit a bare float literal (DuckDB would type it DECIMAL)
            if v == int(v):
                return f"CAST({int(v)} AS DOUBLE)"
            num = v * 1048576.0
            assert num == int(num), "grid bounds must be dyadic rationals"
            return f"(CAST({int(num)} AS DOUBLE) / CAST(1048576 AS DOUBLE))"

        return (
            f"(CAST(FLOOR(({y_expr} - {d(self.miny)}) / {d(self.cell_h)}) AS BIGINT) * {n} "
            f"+ CAST(FLOOR(({x_expr} - {d(self.minx)}) / {d(self.cell_w)}) AS BIGINT))"
        )


# ---------------------------------------------------------------------------
# Morton / Hilbert encodings (ordering keys)
# ---------------------------------------------------------------------------

def _part1by1(v: np.ndarray) -> np.ndarray:
    """Interleave bits of 16-bit ints with zeros (MortonCode.cs:59-70)."""
    v = v.astype(np.uint64) & np.uint64(0x0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x33333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x55555555)
    return v


def morton_encode(ix: np.ndarray, iy: np.ndarray) -> np.ndarray:
    """Z-order curve position of integer grid coords (MortonCode.cs:110)."""
    return (_part1by1(np.asarray(iy)) << np.uint64(1) | _part1by1(np.asarray(ix))).astype(
        np.int64
    )


def hilbert_encode(ix: np.ndarray, iy: np.ndarray, level: int) -> np.ndarray:
    """Hilbert curve position at ``level`` (HilbertCode.cs:111 Encode).

    Vectorized iterative xy→d transform (Warren, Hacker's Delight /
    Wikipedia formulation — same curve as the reference's table-driven
    encoder up to orientation convention).
    """
    x = np.asarray(ix, dtype=np.int64).copy()
    y = np.asarray(iy, dtype=np.int64).copy()
    rx = np.zeros_like(x)
    ry = np.zeros_like(y)
    d = np.zeros_like(x)
    s = np.int64(1 << (level - 1))
    while s > 0:
        rx = np.where((x & s) > 0, 1, 0).astype(np.int64)
        ry = np.where((y & s) > 0, 1, 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = np.where(flip, s - 1 - x, x)
        y_f = np.where(flip, s - 1 - y, y)
        x_new = np.where(swap, y_f, x_f)
        y_new = np.where(swap, x_f, y_f)
        x, y = x_new, y_new
        s >>= 1
    return d
