"""Python worker daemon wrapper: pyspark.daemon plus one targeted fix.

Why this exists (r16 optimization round, guide §4 "the Python boundary"):
every PySpark task begins with ``pyspark.worker_util.setup_spark_files``,
which unconditionally calls ``importlib.invalidate_caches()``. On
Python 3.11, ``zipimport.zipimporter.invalidate_caches()`` re-reads the
ENTIRE zip central directory from disk on every call, and a Spark
worker's ``sys.path_importer_cache`` holds one zipimporter per traversed
zip path entry (pyspark.zip, py4j zip, the spark-core jar, plus one per
package subdirectory inside them — 16 finders here). Measured on this
box: ~117 ms of pure directory re-reading PER TASK, in EVERY Python
worker task, warm or not — it was the single largest component of every
mapInPandas/applyInPandas stage (a trivial 1-task mapInPandas ran
150 ms; the worker's own batch loop was 1 ms).

The fix backports CPython 3.12's behavior (bpo/gh-84801 family): only
re-read the zip directory when the archive's mtime actually changed.
Zip/jar path entries are immutable during a Spark application's
lifetime, so the stat-guard turns ~117 ms of re-reads into ~16 stat
calls (microseconds) while keeping the exact invalidation semantics —
a genuinely replaced archive still gets re-read (fresh mtime), and a
finder created after fork re-reads once on its first invalidation.

Installed via ``spark.python.daemon.module`` (supported since Spark
2.4): the patch runs once in the daemon parent process, and every
forked worker inherits it. No pyspark source is modified; removing the
conf restores stock behavior.
"""

from __future__ import annotations

import os
import zipimport

_MTIME_ATTR = "_sparrow_zip_mtime"


def install_zipimport_mtime_guard() -> None:
    """Monkeypatch zipimporter.invalidate_caches with an mtime guard.

    Idempotent: re-installing over an already-patched class is a no-op.
    """
    orig = zipimport.zipimporter.invalidate_caches
    if getattr(orig, "_sparrow_mtime_guard", False):
        return

    def invalidate_caches(self):  # type: ignore[no-untyped-def]
        try:
            mtime = os.stat(self.archive).st_mtime_ns
        except OSError:
            # Archive gone/unreadable: fall through to the original,
            # which knows how to mark the importer invalid.
            orig(self)
            return
        if getattr(self, _MTIME_ATTR, None) == mtime:
            return
        orig(self)
        # Record AFTER a successful re-read so a failed read retries.
        setattr(self, _MTIME_ATTR, mtime)

    invalidate_caches._sparrow_mtime_guard = True  # type: ignore[attr-defined]
    zipimport.zipimporter.invalidate_caches = invalidate_caches  # type: ignore[method-assign]


install_zipimport_mtime_guard()


if __name__ == "__main__":
    from pyspark.daemon import manager

    manager()
