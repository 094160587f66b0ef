"""Ship the engine package to executor Python workers at runtime.

Arrow pUDF kernels are serialized BY REFERENCE to their defining module, so
executors must be able to ``import etna_spark``. Under spark-submit that is
``--py-files etna_spark.zip``; when the engine is driven by an external
harness that creates the SparkSession itself (the graft driver, notebooks),
:func:`ensure_shipped` zips the installed package and ``addPyFile``s it —
idempotent, works after session creation, no-op on real clusters that
already shipped the zip.
"""

from __future__ import annotations

import hashlib
import os
import zipfile

from pyspark.sql import SparkSession

_SHIPPED: set[int] = set()


def _content_key(pkg_dir: str) -> str:
    """Digest of every source file's (path, size, mtime) so edits rebuild the
    zip — a stale cached zip makes executors import OLD code silently."""
    h = hashlib.sha256()
    for root, _dirs, files in os.walk(pkg_dir):
        for f in sorted(files):
            if f.endswith(".py"):
                full = os.path.join(root, f)
                st = os.stat(full)
                h.update(
                    f"{os.path.relpath(full, pkg_dir)}:{st.st_size}:"
                    f"{st.st_mtime_ns}\n".encode()
                )
    return h.hexdigest()[:16]


def ensure_shipped(spark: SparkSession) -> None:
    key = id(spark.sparkContext)
    if key in _SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join("/tmp", f"etna_spark_pkg-{_content_key(pkg_dir)}.zip")
    if not os.path.exists(zip_path):
        tmp = zip_path + f".{os.getpid()}"
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
            for root, _dirs, files in os.walk(pkg_dir):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        rel = os.path.join(
                            "etna_spark", os.path.relpath(full, pkg_dir)
                        )
                        z.write(full, rel)
        os.replace(tmp, zip_path)
    spark.sparkContext.addPyFile(zip_path)
    _SHIPPED.add(key)
