"""SQL-facing spatial functions (ST_* style) over the corpus-verified kernels."""
