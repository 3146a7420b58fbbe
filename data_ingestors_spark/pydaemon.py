"""Python-worker daemon with heavy libraries preloaded (guide §4.5).

``spark.python.worker.reuse=false`` (session.py, r12-opt) kills
cross-stage worker heap bloat by forking a FRESH worker per task — but
each fresh worker then re-pays the numpy/pandas/pyarrow import chain
(~0.4-0.8 s of CPU per fork, times up to ``local[N]`` concurrent
workers per python stage). Importing those modules HERE, in the daemon
process every worker forks from, moves that cost to one-time daemon
startup: forked children inherit the fully-initialised modules through
copy-on-write memory, so ``import numpy`` inside the worker (or inside
pyspark's Arrow serializers) becomes a sys.modules lookup.

This changes process setup only — no computation, serialization format
or result is affected. Libraries are imported best-effort so a
minimal environment without pandas still works (workers then import
lazily exactly as before). No computation is run at import time: BLAS
thread pools and Arrow memory-pool background threads initialise
lazily on first use, which happens post-fork in the worker, keeping
the daemon itself single-threaded at fork time (the fork-safety
contract pyspark's daemon relies on).

Activated via ``spark.python.daemon.module`` in
:func:`data_ingestors_spark.session.get_spark`; the repo root is put
on the workers' PYTHONPATH there so this module resolves in the
spawned daemon interpreter.
"""

from __future__ import annotations

import importlib

for _m in ("numpy", "pandas", "pyarrow"):
    try:  # pragma: no cover - exercised in spawned daemons, not pytest
        importlib.import_module(_m)
    except Exception:
        pass

if __name__ == "__main__":
    from pyspark.daemon import manager

    manager()
