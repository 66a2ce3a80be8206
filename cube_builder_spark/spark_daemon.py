"""Pre-warmed PySpark worker daemon (``spark.python.daemon.module``).

Python workers are forked from this daemon process; anything imported
HERE is inherited by every worker through fork copy-on-write. The
stock ``pyspark.daemon`` imports almost nothing, so each fresh worker
pays ~2.3 s of single-threaded ``pandas``/``pyarrow`` import before
its first Arrow batch — and the worker pool churns during a long
session (Spark destroys a worker whenever a task ends without fully
draining it, e.g. under any ``limit`` over a Python-evaluated stage),
so a 32-core box can re-pay that import storm many times per run.
Measured on this engine's bench: the first Python-stage query after a
pool cull forked ~30 workers at once and ran 2-17x its steady-state
time (guide §4.5: initialise heavyweight state once — here, once per
DAEMON instead of once per worker).

Failure-safety: imports are best-effort — a missing optional module
must not take down the worker factory; ``manager()`` is the stock
daemon entry point and runs unchanged.
"""

import importlib

for _m in ("numpy", "pandas", "pyarrow", "pyarrow.compute",
           "pyspark.sql.pandas.serializers", "pyspark.sql.pandas.types"):
    try:
        importlib.import_module(_m)
    except Exception:  # pragma: no cover - optional module absent
        pass

if __name__ == "__main__":
    from pyspark.daemon import manager
    manager()
