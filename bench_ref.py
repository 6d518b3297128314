"""Reference perf-workload shapes, reproduced on this engine's kernels.

BASELINE.md lists the reference's own performance-test CONFIGURATIONS as
baselines to reproduce (it publishes no absolute numbers — its harness
prints wall-clock at runtime). This script runs the same workload shapes
single-node against the corresponding kernels and records throughput:

1. PIP probe  — ``IndexedPointInAreaPerfTest.cs:16-35``: 100-point circle
   polygon of size 100, 100,000 random points in [0,100)². Reference uses
   ``Random(1324)``; here the same uniform field comes from a seeded
   generator (the workload shape, not the bit-level point set, is the
   baseline).
2. STRtree    — ``STRtreePerfTest.cs`` / ``TreeTimeTest.cs`` shape: bulk
   build over N random envelopes + N box queries.
3. OverlayNG  — ``OverlayNGPerfTest.cs:26-38``: sine star A (origin
   (100,100), size 200, N_ARMS=6, ARM_RATIO=0.3) intersected with a 20×20
   grid of small sine stars (nptsB = npts/400, min 10), for npts in
   RUN_SIZES. (The reference ladder runs 100k-200k pts; the vectorized
   candidate pass + exact-rational escalation runs the 100k rung here.)

Prints ONE JSON line and writes BENCH/REF_WORKLOADS.md.

Usage: python bench_ref.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nettopologysuite_spark.kernels.overlay import INTERSECTION, overlay  # noqa: E402
from nettopologysuite_spark.kernels.pip import EXTERIOR, PreparedPolygon  # noqa: E402
from nettopologysuite_spark.kernels.shapes import circle, sine_star  # noqa: E402
from nettopologysuite_spark.kernels.strtree import STRtree  # noqa: E402


def pip_probe(n_pts: int = 100_000, iters: int = 10) -> dict:
    poly = circle(50.0, 50.0, 100.0, 100)
    prep = PreparedPolygon(poly)  # build once, probe many
    rng = np.random.default_rng(1324)  # seed analog of Random(1324)
    px = rng.uniform(0, 100, n_pts)
    py = rng.uniform(0, 100, n_pts)
    prep.locate(px[:1000], py[:1000])  # warm
    best = float("inf")
    inside = 0
    for _ in range(iters):
        t0 = time.time()
        loc = prep.locate(px, py)
        best = min(best, time.time() - t0)
        inside = int((loc != EXTERIOR).sum())  # interior + boundary
    return {
        "points": n_pts, "inside": inside,
        "best_sec": round(best, 4),
        "points_per_sec": round(n_pts / best, 1),
    }


def strtree_workload(n: int = 100_000) -> dict:
    rng = np.random.default_rng(7)
    c = rng.uniform(0, 1000, (n, 2))
    w = rng.uniform(0.1, 2.0, (n, 2))
    envs = np.column_stack([c - w, c + w])
    t0 = time.time()
    tree = STRtree(envs)
    build = time.time() - t0
    qc = rng.uniform(0, 1000, (n, 2))
    boxes = np.column_stack([qc - 1.0, qc + 1.0])
    t0 = time.time()
    qi, _items = tree.query_batch(boxes)
    query = time.time() - t0
    return {
        "items": n, "build_sec": round(build, 3),
        "query_sec": round(query, 3), "hits": int(len(qi)),
        "queries_per_sec": round(n / query, 1),
    }


RUN_SIZES = (100, 1000, 10_000, 100_000)
GRID_SIZE = 20
NUM_CASES = GRID_SIZE * GRID_SIZE


def overlay_workload() -> list[dict]:
    out = []
    size = 200.0
    cell = size / GRID_SIZE
    for npts in RUN_SIZES:
        a = sine_star(100.0, 100.0, size, npts, n_arms=6, arm_ratio=0.3)
        nptsb = max(npts // NUM_CASES, 10)
        bs = []
        for i in range(GRID_SIZE):
            for j in range(GRID_SIZE):
                bs.append(sine_star(cell / 2 + i * cell, cell / 2 + j * cell,
                                    cell, nptsb, n_arms=6, arm_ratio=0.3))
        t0 = time.time()
        n_nonempty = 0
        for b in bs:
            if not overlay(a, b, INTERSECTION).is_empty:
                n_nonempty += 1
        dt = time.time() - t0
        out.append({
            "npts_a": npts, "npts_b": nptsb, "cases": NUM_CASES,
            "nonempty": n_nonempty, "sec": round(dt, 3),
            "overlays_per_sec": round(NUM_CASES / dt, 1),
        })
    return out


def main():
    res = {
        "pip_probe": pip_probe(),
        "strtree": strtree_workload(),
        "overlay_ng": overlay_workload(),
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/REF_WORKLOADS.md", "w") as f:
        p = res["pip_probe"]
        s = res["strtree"]
        f.write(
            "# Reference perf-workload shapes on this engine's kernels\n\n"
            "The reference publishes workload CONFIGURATIONS, not numbers\n"
            "(BASELINE.md rows 'PIP probe', 'Index build+query', 'OverlayNG\n"
            "throughput'). Same shapes, single-node, this engine's kernels:\n\n"
            "## PIP probe (IndexedPointInAreaPerfTest.cs:16-35)\n\n"
            f"100-pt circle size 100, {p['points']:,} random points: "
            f"**{p['points_per_sec']:,} points/sec** "
            f"(best of 10, {p['best_sec']}s; {p['inside']:,} covered — the\n"
            "whole batch probes one prepared polygon, so this is the\n"
            "per-executor kernel throughput of the PIP join refine).\n\n"
            "## STRtree build + query (STRtreePerfTest / TreeTimeTest shape)\n\n"
            f"{s['items']:,} envelopes: build {s['build_sec']}s; "
            f"{s['items']:,} box queries in {s['query_sec']}s "
            f"(**{s['queries_per_sec']:,} queries/sec**, {s['hits']:,} hits, "
            "bulk vectorized descent).\n\n"
            "## OverlayNG ladder (OverlayNGPerfTest.cs:26-38)\n\n"
            "Sine star A × 400-cell grid of sine stars (intersection, exact\n"
            "rational noding — the reference's floating+retry ladder rungs\n"
            "100..200k; the vectorized candidate pass with exact-rational\n"
            "escalation runs the 100k rung here):\n\n"
            "| A pts | B pts | overlays/sec |\n|---|---|---|\n"
            + "\n".join(
                f"| {r['npts_a']:,} | {r['npts_b']} | {r['overlays_per_sec']:,} |"
                for r in res["overlay_ng"]
            )
            + "\n"
        )
    print(json.dumps(res))


if __name__ == "__main__":
    main()
