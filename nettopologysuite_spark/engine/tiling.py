"""Tile (cell) assignment at the DataFrame layer.

For (x, y) double columns the cell id is a *pure Catalyst projection*
(floor arithmetic) — whole-stage-codegen'd JVM-side, pushdown-friendly,
no Python at all. The pandas-UDF path exists only for WKB geometry
columns (decode → envelope → cover cells), and uses the all-points
vectorized fast path of ``kernels.geom.wkb_to_points``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..kernels.cells import Grid, hilbert_encode
from ..kernels.envelope import envelopes_of_wkb
from ..kernels.geom import wkb_to_points
from .derive import morton_sql_expr


def cell_col(grid: Grid, x: str = "x", y: str = "y") -> Column:
    """Native (JVM) cell-id projection: iy * n + ix with clamping."""
    n = grid.n
    ix = F.floor((F.col(x) - F.lit(grid.minx)) / F.lit(grid.cell_w)).cast("long")
    iy = F.floor((F.col(y) - F.lit(grid.miny)) / F.lit(grid.cell_h)).cast("long")
    ix = F.greatest(F.lit(0), F.least(F.lit(n - 1), ix))
    iy = F.greatest(F.lit(0), F.least(F.lit(n - 1), iy))
    return (iy * n + ix).cast("long")


def with_cell_id(df: DataFrame, grid: Grid, x: str = "x", y: str = "y",
                 out: str = "cell_id") -> DataFrame:
    return df.withColumn(out, cell_col(grid, x, y))


def morton_col(grid: Grid, x: str = "x", y: str = "y") -> Column:
    """Z-order curve position as a native SQL expression (for ORDER BY /
    write clustering — see kernels.cells docstring)."""
    n = grid.n
    ix = f"GREATEST(0, LEAST({n - 1}, CAST(FLOOR(({x} - {grid.minx!r}) / {grid.cell_w!r}) AS BIGINT)))"
    iy = f"GREATEST(0, LEAST({n - 1}, CAST(FLOOR(({y} - {grid.miny!r}) / {grid.cell_h!r}) AS BIGINT)))"
    return F.expr(morton_sql_expr(ix, iy, grid.level))


def hilbert_udf(grid: Grid):
    """Hilbert curve position from cell id (pandas UDF; ordering only)."""

    level = grid.level
    n = grid.n

    @pandas_udf("long")
    def _hilbert(cell: pd.Series) -> pd.Series:
        c = cell.to_numpy("int64")
        iy, ix = divmod(c, n)
        return pd.Series(hilbert_encode(ix, iy, level))

    return _hilbert


def cell_of_wkb_udf(grid: Grid):
    """Cell id of point-WKB geometries (envelope center for non-points)."""

    @pandas_udf("long")
    def _cell(wkb: pd.Series) -> pd.Series:
        xy, _ = wkb_to_points(wkb.to_list())
        return pd.Series(grid.cell_ids(xy[:, 0], xy[:, 1]))

    return _cell


def cover_cells_udf(grid: Grid, expand: float = 0.0):
    """Covering cell ids (array<long>) of arbitrary WKB geometries, via
    envelope cover — the multi-cell replication step for non-point inputs."""

    @pandas_udf("array<long>")
    def _cover(wkb: pd.Series) -> pd.Series:
        envs = envelopes_of_wkb(wkb.to_list())
        out = []
        for minx, miny, maxx, maxy in envs:
            if minx != minx:  # NaN → empty geometry
                out.append([])
            else:
                out.append(
                    [int(c) for c in grid.cover_envelope(
                        minx - expand, miny - expand, maxx + expand, maxy + expand)]
                )
        return pd.Series(out)

    return _cover
