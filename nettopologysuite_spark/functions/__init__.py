"""SQL-facing spatial functions (ST_* style) over the corpus-verified kernels."""

from .st_funcs import build_registry, register_all  # noqa: F401,E402
