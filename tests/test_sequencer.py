"""LineSequencer vs reference LineSequencerTest fixtures (sequence validity
is asserted everywhere; exact orderings where they are unique)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nettopologysuite_spark.kernels.geom import wkt_dumps, wkt_loads  # noqa: E402
from nettopologysuite_spark.kernels.sequencer import sequence_lines  # noqa: E402


def _run(wkts):
    return sequence_lines([wkt_loads(w) for w in wkts])


def _assert_valid_sequence(result, wkts):
    assert result is not None
    parts = result.parts
    assert len(parts) == len(wkts)
    # consecutive parts share endpoints
    for a, b in zip(parts, parts[1:]):
        assert tuple(a.coords[-1]) == tuple(b.coords[0])
    # every input line used exactly once (as-is or reversed)
    used = sorted(
        tuple(map(tuple, sorted([tuple(p.coords[0]), tuple(p.coords[-1])])))
        for p in parts
    )
    expect = sorted(
        tuple(map(tuple, sorted([
            tuple(wkt_loads(w).coords[0]), tuple(wkt_loads(w).coords[-1])
        ])))
        for w in wkts
    )
    assert used == expect


def test_simple():
    wkts = [
        "LINESTRING ( 0 0, 0 10 )",
        "LINESTRING ( 0 20, 0 30 )",
        "LINESTRING ( 0 10, 0 20 )",
    ]
    got = _run(wkts)
    assert wkt_dumps(got) == (
        "MULTILINESTRING ((0 0, 0 10), (0 10, 0 20), (0 20, 0 30))"
    )


def test_simple_loop():
    wkts = ["LINESTRING ( 0 0, 0 10 )", "LINESTRING ( 0 10, 0 0 )"]
    got = _run(wkts)
    assert wkt_dumps(got) == "MULTILINESTRING ((0 0, 0 10), (0 10, 0 0))"


def test_simple_big_loop():
    wkts = [
        "LINESTRING ( 0 0, 0 10 )",
        "LINESTRING ( 0 20, 0 30 )",
        "LINESTRING ( 0 30, 0 0 )",
        "LINESTRING ( 0 10, 0 20 )",
    ]
    got = _run(wkts)
    assert wkt_dumps(got) == (
        "MULTILINESTRING ((0 0, 0 10), (0 10, 0 20), (0 20, 0 30), (0 30, 0 0))"
    )


def test_two_simple_loops():
    wkts = [
        "LINESTRING ( 0 0, 0 10 )",
        "LINESTRING ( 0 10, 0 0 )",
        "LINESTRING ( 0 0, 0 20 )",
        "LINESTRING ( 0 20, 0 0 )",
    ]
    _assert_valid_sequence(_run(wkts), wkts)


def test_square_loop():
    wkts = [
        "LINESTRING ( 0 0, 0 10 )",
        "LINESTRING ( 20 10, 20 0 )",
        "LINESTRING ( 20 0, 0 0 )",
        "LINESTRING ( 0 10, 20 10 )",
    ]
    got = _run(wkts)
    assert wkt_dumps(got) == (
        "MULTILINESTRING ((0 0, 0 10), (0 10, 20 10), (20 10, 20 0), (20 0, 0 0))"
    )


def test_not_sequenceable():
    wkts = [
        "LINESTRING ( 0 0, 0 10 )",
        "LINESTRING ( 0 10, 0 20 )",
        "LINESTRING ( 0 10, 10 10 )",
        "LINESTRING ( 0 10, -10 10 )",
    ]
    assert _run(wkts) is None
