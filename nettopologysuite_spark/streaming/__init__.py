from .tile_stream import (  # noqa: F401
    run_available_now,
    run_to_parquet,
    run_updates_to_parquet,
    stream_cell_envelopes,
    stream_dedup_docs,
    stream_near_dedup,
    stream_pip_join,
    stream_stream_tile_join,
    stream_tile_assign,
    stream_tile_counts,
)
