"""Preload heavy libraries in the pyspark worker daemon.

Placed on PYTHONPATH for the Spark session (jobs do this via
pipeline.enable_worker_preload), this runs once in the pyspark.daemon
process; forked workers inherit the imported modules copy-on-write,
eliminating the ~2s numpy/pandas/pyarrow import that every fresh
worker otherwise pays on its first task. At N workers that is 2N
core-seconds of pure import overhead per job — measurable against
scaling efficiency on short jobs.
"""
import os

if os.environ.get("TTDP_PRELOAD", "1") == "1":
    try:
        import numpy  # noqa: F401
        import pandas  # noqa: F401
        import pyarrow  # noqa: F401
        import pyarrow.compute  # noqa: F401
    except Exception:
        pass
