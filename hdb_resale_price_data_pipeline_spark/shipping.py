"""Ship this package to Spark Python workers.

Any Pandas-UDF / mapInPandas closure defined in this package is
cloudpickled *by reference* to its module, so executors must be able to
import ``hdb_resale_price_data_pipeline_spark``. On a cluster that means
``--py-files``; programmatically it means ``sc.addPyFile`` with a zip of
the package. Called lazily (and idempotently per session) by every
operator that crosses the Python boundary.
"""

from __future__ import annotations

import hashlib
import os
import zipfile

from pyspark.sql import SparkSession

_SHIPPED_SESSIONS: set[int] = set()


def _package_zip() -> str:
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(pkg_dir)
    stamp = hashlib.md5(pkg_dir.encode()).hexdigest()[:10]
    zip_path = f"/tmp/{pkg_name}_{stamp}.zip"
    # rebuild when any source file is newer than the zip
    sources = [
        os.path.join(root, f)
        for root, _, files in os.walk(pkg_dir)
        for f in files
        if f.endswith(".py")
    ]
    if os.path.exists(zip_path) and all(
        os.path.getmtime(s) <= os.path.getmtime(zip_path) for s in sources
    ):
        return zip_path
    tmp = zip_path + ".tmp"
    with zipfile.ZipFile(tmp, "w") as zf:
        for src in sources:
            arcname = os.path.join(pkg_name, os.path.relpath(src, pkg_dir))
            zf.write(src, arcname)
    os.replace(tmp, zip_path)
    return zip_path


def ensure_package_shipped(spark: SparkSession) -> None:
    key = id(spark.sparkContext)
    if key in _SHIPPED_SESSIONS:
        return
    spark.sparkContext.addPyFile(_package_zip())
    _SHIPPED_SESSIONS.add(key)
