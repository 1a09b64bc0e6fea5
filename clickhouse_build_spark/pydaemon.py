"""Python worker daemon with preloaded heavy modules.

PySpark forks every Python worker from a per-executor daemon process
(``pyspark.daemon``). The stock daemon imports almost nothing, so each
forked worker pays the full ``import pandas`` + ``import numpy`` cost
(~2-3 s of CPU each) the first time it runs an Arrow kernel — and with
32 cores forking at once, the first ``mapInPandas`` stage of a session
burns ~100 s of CPU (measured: 3.4 s/task x 32 tasks) before any real
work. Worse, idle workers are reaped between sparse Python stages, so
a long mixed workload (the bench's 105 queries, mostly JVM-only) pays
the import storm again at every Python-stage cluster.

Importing the heavy modules HERE — in the daemon, before it starts
forking — makes every worker inherit them already-initialized via
copy-on-write fork memory: the import cost is paid once per executor,
not once per worker per reap cycle.

Wired up via ``spark.python.daemon.module`` (session.py). The daemon
protocol itself is unchanged — this module delegates straight to
``pyspark.daemon.manager``.
"""

# Preload before the fork server starts: workers inherit these via COW.
import hashlib  # noqa: F401
import zlib  # noqa: F401

import numpy  # noqa: F401
import pandas  # noqa: F401

try:  # Arrow serialization path used by every pandas-UDF exchange
    import pyarrow  # noqa: F401
    import pyarrow.pandas_compat  # noqa: F401
except ImportError:  # pragma: no cover - pyarrow ships with this repo
    pass

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
