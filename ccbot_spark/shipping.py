"""Self-shipping: make the ccbot_spark package importable on executors.

The cluster deployment is ``spark-submit --py-files ccbot_spark.zip``
(BASELINE.json north_rule); for library/notebook use this module builds
the same zip on the fly and registers it with ``addPyFile`` so Python
workers can unpickle our UDFs regardless of the driver's cwd.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_shipped: set[int] = set()


def package_zip() -> str:
    """Build (once) a zip of the ccbot_spark package; return its path.
    The same artifact is what you pass to spark-submit --py-files."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    out = os.path.join(tempfile.gettempdir(), "ccbot_spark_pyfiles.zip")
    tmp = out + f".{os.getpid()}.tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(files):
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    rel = os.path.join(
                        "ccbot_spark", os.path.relpath(full, pkg_dir)
                    )
                    z.write(full, rel)
    os.replace(tmp, out)
    return out


def ensure_shipped(spark) -> None:
    """Idempotently attach the package zip to the session's SparkContext."""
    sc = spark.sparkContext
    key = id(sc)
    if key in _shipped:
        return
    sc.addPyFile(package_zip())
    _shipped.add(key)
