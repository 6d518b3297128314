"""PySpark dataflow layer: tiling, spatial joins, aggregates, pipeline ops."""
