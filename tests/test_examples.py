"""The quickstart example must keep running as-is."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_quickstart_runs(spark):
    from examples.quickstart import main

    counts = main(spark)
    assert set(counts) == {"zone-a", "zone-b"}
