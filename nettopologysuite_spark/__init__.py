"""nettopologysuite_spark — a PySpark-native spatial-join + tiling engine.

Brand-new engine (NOT a port) with the operator semantics of
NetTopologySuite/JTS (reference: /root/reference), re-expressed as
distributed dataflow:

- ``kernels/``  pure numpy/pyarrow geometry kernels (no Spark imports):
  WKT/WKB codecs, envelopes, prepared point-in-polygon (ray crossing),
  DE-9IM predicates, distance, measures, hulls, simplification, STRtree,
  space-filling-curve cell encoding.
- ``engine/``   PySpark dataflow: docs-table synthesis, tile assignment,
  cell-partitioned spatial joins (broadcast / sort-merge), distance + kNN
  joins, spatial aggregates, dedup / text-quality / ANN pipeline operators.

Everything at the Spark layer is DataFrame + vectorized pandas/Arrow UDFs —
zero per-row Python.
"""

__version__ = "0.1.0"
