"""Tile (cell) assignment at the DataFrame layer.

For (x, y) double columns the cell id is a *pure Catalyst projection*
(floor arithmetic) — whole-stage-codegen'd JVM-side, pushdown-friendly,
no Python at all. WKB geometry columns cross Python exactly once, through
the vectorized ``envelope_struct_udf``; the cover-cells explode itself is
native ``sequence()`` arithmetic (``explode_cover_native``).
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


def envelope_struct_udf():
    """Vectorized WKB → envelope struct (minx, miny, maxx, maxy).

    Uniform simple batches (points / equal-shape rects) decode through the
    single-buffer fast path of ``envelopes_of_wkb`` — no per-row Python.
    Empty geometries yield NaN (callers filter with ``isnan``).

    Marked non-deterministic ON PURPOSE (it is in fact deterministic): the
    optimizer otherwise collapses projections and infers isnotnull
    constraints from downstream join conditions, duplicating this UDF —
    the physical plan showed every side's envelope (and any upstream
    geometry-producing UDF) evaluated twice. Non-determinism pins ONE
    evaluation whose output is then referenced as a plain attribute."""

    @pandas_udf("struct<minx:double,miny:double,maxx:double,maxy:double>")
    def _env(wkb: pd.Series) -> pd.DataFrame:
        envs = envelopes_of_wkb(wkb.to_list())
        return pd.DataFrame(
            {"minx": envs[:, 0], "miny": envs[:, 1],
             "maxx": envs[:, 2], "maxy": envs[:, 3]}
        )

    return _env.asNondeterministic()


def explode_cover_native(df: DataFrame, grid: Grid, env: str = "_env",
                         out: str = "cell_id") -> DataFrame:
    """Explode each row to its envelope-covering cell ids — pure Catalyst.

    The cover of an envelope on a regular grid is a RECTANGLE of cell
    indices, so the explode is two native ``sequence()`` ranges (column
    span × row span) — whole-stage-codegen'd, no Python, no array
    materialization per row. Rows with NaN envelopes (empty geoms) explode
    to an EMPTY array (dropped) — a ``when`` branch, deliberately not a
    separate ``filter``: a filter referencing the envelope column would be
    pushed below the Generate and force a second evaluation of the
    envelope UDF (observed in the physical plan).
    """
    n = grid.n

    def _clamp(c):
        return F.greatest(F.lit(0), F.least(F.lit(n - 1), c))

    ix_lo = _clamp(F.floor((F.col(f"{env}.minx") - F.lit(grid.minx)) / F.lit(grid.cell_w)).cast("long"))
    ix_hi = _clamp(F.floor((F.col(f"{env}.maxx") - F.lit(grid.minx)) / F.lit(grid.cell_w)).cast("long"))
    iy_lo = _clamp(F.floor((F.col(f"{env}.miny") - F.lit(grid.miny)) / F.lit(grid.cell_h)).cast("long"))
    iy_hi = _clamp(F.floor((F.col(f"{env}.maxy") - F.lit(grid.miny)) / F.lit(grid.cell_h)).cast("long"))
    is_nan = F.isnan(F.col(f"{env}.minx"))
    empty = F.array().cast("array<bigint>")
    return (
        df.withColumn(
            "_iyc",
            F.explode(F.when(is_nan, empty).otherwise(F.sequence(iy_lo, iy_hi))),
        )
        .withColumn(
            "_ixc",
            F.explode(F.when(is_nan, empty).otherwise(F.sequence(ix_lo, ix_hi))),
        )
        .withColumn(out, (F.col("_iyc") * n + F.col("_ixc")).cast("long"))
        .drop("_iyc", "_ixc")
    )


