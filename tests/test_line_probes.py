"""Mixed-dimension DE-9IM batching: line rows × polygonal container.

The batched probe kernel must agree with the scalar relate kernel on every
DECIDED row, and the caller composition (probes + scalar escalation for
ambiguous rows) must agree on EVERY row — including the planted
boundary-collinear / vertex-tangent configurations that force escalation.
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nettopologysuite_spark.engine.derive import nation_octagon_geom  # noqa: E402
from nettopologysuite_spark.kernels.batchgeom import (  # noqa: E402
    GeomBatch,
    PreparedRight,
    batch_intersects,
    batch_line_im_probes,
)
from nettopologysuite_spark.kernels.geom import wkt_loads  # noqa: E402
from nettopologysuite_spark.kernels.predicates import evaluate_predicate  # noqa: E402


def _lines_for(oct_g):
    """Random + adversarial lines around one octagon."""
    env = np.asarray(oct_g.envelope())
    cx, cy = (env[0] + env[2]) / 2, (env[1] + env[3]) / 2
    w = env[2] - env[0]
    rng = np.random.default_rng(int(cx * 7 + cy))
    out = []
    for _ in range(60):
        p = rng.uniform([env[0] - w, env[1] - w], [env[2] + w, env[3] + w], (2, 2))
        out.append(f"LINESTRING ({p[0,0]} {p[0,1]}, {p[1,0]} {p[1,1]})")
    ring = oct_g.rings[0]
    # collinear with an edge (inside the edge span and extended beyond)
    a, b = ring[0], ring[1]
    m = (a + b) / 2
    out.append(f"LINESTRING ({a[0]} {a[1]}, {m[0]} {m[1]})")
    ext = b + (b - a)
    out.append(f"LINESTRING ({a[0]} {a[1]}, {ext[0]} {ext[1]})")
    # through a vertex
    v = ring[2]
    d = v - np.array([cx, cy])
    q = v + d
    out.append(f"LINESTRING ({cx} {cy}, {q[0]} {q[1]})")
    # tangent at a vertex (perpendicular to the radius)
    t = np.array([-d[1], d[0]])
    p1, p2 = v - t, v + t
    out.append(f"LINESTRING ({p1[0]} {p1[1]}, {p2[0]} {p2[1]})")
    # fully inside / fully outside / polyline spanning through
    out.append(f"LINESTRING ({cx - 0.2} {cy}, {cx + 0.2} {cy}, {cx} {cy + 0.2})")
    out.append(f"LINESTRING ({env[0] - 3} {env[1] - 3}, {env[0] - 2} {env[1] - 1})")
    out.append(
        f"LINESTRING ({env[0] - 1} {cy}, {cx} {cy}, {env[2] + 1} {cy})"
    )
    return out


def test_line_probes_match_scalar_relate():
    n_amb = n_dec = 0
    for nk in range(6):
        oct_g = nation_octagon_geom(nk)
        lines = [wkt_loads(w) for w in _lines_for(oct_g)]
        gb = GeomBatch(lines)
        pl = PreparedRight(oct_g)
        rows = np.arange(len(lines))
        ii, ei, amb = batch_line_im_probes(gb, rows, pl)
        inter = batch_intersects(gb, rows, pl)
        for k, line in enumerate(lines):
            want_t = evaluate_predicate("touches", oct_g, line)
            want_c = evaluate_predicate("crosses", oct_g, line)
            if amb[k]:
                n_amb += 1
                continue  # caller escalates — no claim from the probes
            n_dec += 1
            got_t = bool(inter[k] and not ii[k])
            got_c = bool(ii[k] and ei[k])
            assert got_t == want_t, (nk, k, line)
            assert got_c == want_c, (nk, k, line)
    # the probes must decide the overwhelming majority (generic lines)
    assert n_dec > 10 * n_amb, (n_dec, n_amb)


def test_line_probe_join_udf_matches_scalar(spark):
    """End-to-end through pair_refine_udf: a lines×polygons crosses/touches
    join equals the per-pair scalar evaluation."""
    import pandas as pd
    from pyspark.sql import functions as F

    from nettopologysuite_spark.engine.joins import pair_refine_udf
    from nettopologysuite_spark.kernels.geom import wkb_dumps, wkb_loads

    oct_g = nation_octagon_geom(3)
    lines = [wkt_loads(w) for w in _lines_for(oct_g)]
    rows = [(i, bytearray(wkb_dumps(ln)), bytearray(wkb_dumps(oct_g)))
            for i, ln in enumerate(lines)]
    df = spark.createDataFrame(rows, "i long, lwkb binary, rwkb binary")
    for pred in ("crosses", "touches"):
        got = {
            r["i"]
            for r in df.filter(
                pair_refine_udf(pred)(F.col("lwkb"), F.col("rwkb"))
            ).collect()
        }
        want = {i for i, ln in enumerate(lines)
                if evaluate_predicate(pred, ln, oct_g)}
        assert got == want, pred
