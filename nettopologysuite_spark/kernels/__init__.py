"""Pure numpy geometry kernels. No Spark imports allowed in this package."""
