"""Parser/runner for the reference's golden XML test corpus.

Format (data/NetTopologySuite.TestRunner.Tests/*): <run> with optional
<precisionModel>, then <case> elements each holding <a>/<b> WKT and <test>
elements with <op name=... arg1 arg2 [arg3]>expected</op>
(see test/NetTopologySuite.TestRunner/XmlTest.cs for the op enum).
"""

from __future__ import annotations

import math
import xml.etree.ElementTree as ET
from dataclasses import dataclass
from pathlib import Path

import numpy as np

from nettopologysuite_spark.kernels.geom import Geom, wkt_loads

CORPUS = Path("/root/reference/data/NetTopologySuite.TestRunner.Tests")


@dataclass
class XmlOp:
    case_id: str
    desc: str
    op: str          # lowercase op name
    target: str      # 'a' or 'b' (arg1)
    other: str | None  # arg2 if geometry ref
    arg3: str | None
    expected: str    # raw expected text


@dataclass
class XmlCase:
    case_id: str
    desc: str
    a: Geom | None
    b: Geom | None
    a_wkt: str
    b_wkt: str
    ops: list[XmlOp]
    pm_scale: float | None = None

    def expected_geom(self, op: XmlOp) -> Geom:
        """Expected geometry, built like the runner: through the factory's
        precision model (MakePrecise applies to expected WKT too)."""
        g = wkt_loads(op.expected)
        if self.pm_scale:
            g = _make_precise(g, self.pm_scale)
        return g


def _make_precise(g: Geom, scale: float) -> Geom:
    """PrecisionModel.MakePrecise: floor(v*scale + 0.5)/scale (half-up,
    PrecisionModel.cs:291-311)."""

    def fix(arr: np.ndarray) -> np.ndarray:
        return np.floor(arr * scale + 0.5) / scale

    if g.coords is not None:
        g.coords = fix(g.coords)
    g.rings = [fix(r) for r in g.rings]
    for p in g.parts:
        _make_precise(p, scale)
    return g


def load_file(path: Path) -> list[XmlCase]:
    text = path.read_text(encoding="utf-8-sig", errors="replace")
    root = ET.fromstring(text)
    pm = root.find("precisionModel")
    scale = None
    if pm is not None:
        s = pm.get("scale")
        if s is not None:
            scale = float(s)
        elif pm.get("type", "").upper() in ("", "FLOATING"):
            scale = None
    cases: list[XmlCase] = []
    for idx, case in enumerate(root.findall("case")):
        desc = (case.findtext("desc") or "").strip()
        a_wkt = (case.findtext("a") or "").strip()
        b_wkt = (case.findtext("b") or "").strip()
        try:
            a = wkt_loads(a_wkt) if a_wkt else None
            b = wkt_loads(b_wkt) if b_wkt else None
        except ValueError:
            continue  # WKT features we don't parse yet (e.g. EWKT)
        if scale:
            if a is not None:
                a = _make_precise(a, scale)
            if b is not None:
                b = _make_precise(b, scale)
        ops = []
        for t in case.findall("test"):
            op = t.find("op")
            if op is None:
                continue
            name = (op.get("name") or "").strip().lower()
            arg1 = (op.get("arg1") or "A").strip().lower()
            arg2 = (op.get("arg2") or "").strip().lower()
            arg3 = op.get("arg3")
            ops.append(
                XmlOp(
                    case_id=f"{path.name}#{idx}",
                    desc=desc,
                    op=name,
                    target=arg1,
                    other=arg2 if arg2 in ("a", "b") else None,
                    arg3=arg3.strip() if arg3 else (arg2 if arg2 not in ("a", "b", "") else None),
                    expected=(op.text or "").strip(),
                )
            )
        cases.append(XmlCase(f"{path.name}#{idx}", desc, a, b, a_wkt, b_wkt, ops, scale))
    return cases


def expected_bool(s: str) -> bool:
    return s.strip().lower() == "true"


def expected_num(s: str) -> float:
    return float(s.strip())


def geoms_for(case: XmlCase, op: XmlOp) -> tuple[Geom | None, Geom | None]:
    g1 = case.a if op.target == "a" else case.b
    g2 = None
    if op.other:
        g2 = case.a if op.other == "a" else case.b
    return g1, g2


def norm_or_nan(v: float) -> float:
    return v if not math.isnan(v) else float("nan")
