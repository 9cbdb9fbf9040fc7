"""Ship the package to executors — the spark-submit --py-files artifact.

The north_rule requires the pipeline to ship as ``spark-submit
--py-files`` artifacts. ``build_pyfiles_zip`` produces that artifact;
``ensure_shipped`` attaches it to a live session (equivalent to passing
it on the spark-submit command line) so Python workers can unpickle the
extraction UDF closures regardless of the driver's working directory.
"""

from __future__ import annotations

import atexit
import os
import tempfile
import threading
import zipfile

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_DEFAULT_ZIP: str | None = None  # per-process cache of the default artifact
_DEFAULT_ZIP_LOCK = threading.Lock()


def _write_zip(out_path: str) -> str:
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(_PKG_DIR):
            dirs.sort()
            if "__pycache__" in root:
                continue
            for fn in sorted(files):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                rel = os.path.join("fscrawler_spark", os.path.relpath(full, _PKG_DIR))
                zf.write(full, rel)
    return out_path


def build_pyfiles_zip(out_path: str | None = None) -> str:
    """Zip the fscrawler_spark package (sources only, deterministic order).

    The default artifact is a per-PROCESS temp file built ONCE (lock-
    guarded): a fixed world-shared /tmp name broke multi-user hosts
    (PermissionError on another user's leftover), and rebuilding on
    every get_spark() call would truncate the very file a live session's
    executors fetch via addPyFile (BadZipFile mid-rewrite). Package
    sources cannot change mid-process, so the first build is the build.
    An explicit ``out_path`` always (re)writes."""
    global _DEFAULT_ZIP
    if out_path is not None:
        return _write_zip(out_path)
    with _DEFAULT_ZIP_LOCK:
        if _DEFAULT_ZIP is None:
            fd, path = tempfile.mkstemp(prefix="fscrawler_spark_pyfiles_", suffix=".zip")
            os.close(fd)
            atexit.register(lambda: os.path.exists(path) and os.remove(path))
            _write_zip(path)
            _DEFAULT_ZIP = path
    return _DEFAULT_ZIP


def ensure_shipped(spark) -> None:
    zip_path = build_pyfiles_zip()
    spark.sparkContext.addPyFile(zip_path)
