"""Python worker daemon with preloaded numeric libraries.

Drop-in replacement for ``pyspark.daemon`` (wired via
``spark.python.daemon.module`` in :mod:`largeea_spark.session`): imports
numpy / pandas / pyarrow ONCE in the daemon process before any worker is
forked, so every forked worker inherits the ~1-1.5 s of module-import
work through fork copy-on-write instead of paying it per worker.

Why it matters (round-6 measurement, guide §4.5 applied at the daemon
level): Spark's ``PythonWorkerFactory`` reaps idle workers after a
hardcoded 1 minute, so the first Arrow-kernel stage after any ≥60 s
python-idle gap respawns the whole pool — 32 workers × pandas import on
a 32-core session measured as a ~14 s cliff on an otherwise ~6 s query
(blocked-Jaccard cogroup: 5.7 s warm pool vs 20.2 s after 65 s idle).
Preloading moves the import cost to one daemon startup.

Imports are best-effort: a missing library must not break the daemon —
workers would then just import it themselves as before.
"""

for _mod in ("numpy", "pandas", "pyarrow"):
    try:  # noqa: SIM105 — best-effort preload, never fail the daemon
        __import__(_mod)
    except Exception:  # pragma: no cover - absent lib ⇒ plain daemon
        pass

from pyspark.daemon import manager  # noqa: E402

if __name__ == "__main__":
    manager()
