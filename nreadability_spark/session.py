"""SparkSession construction + package shipping.

Production deploys via ``spark-submit --py-files nreadability_spark.zip``
(the north-rule invocation shape). ``get_spark`` reproduces that from any
driver process: it zips this package and ``addPyFile``s it, so executor
Python workers can unpickle the extraction UDF regardless of the
driver's cwd/sys.path. The zip name is content-hashed, so code changes
ship a fresh archive and unchanged code reuses the cached one.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import zipfile
from pathlib import Path

_PACKAGE_ROOT = Path(__file__).resolve().parent


def package_zip():
    """Zip the nreadability_spark package; returns the archive path."""
    py_files = sorted(
        p for p in _PACKAGE_ROOT.rglob("*.py") if "__pycache__" not in p.parts
    )
    digest = hashlib.sha256()
    for p in py_files:
        digest.update(str(p.relative_to(_PACKAGE_ROOT)).encode())
        digest.update(p.read_bytes())
    out = Path(tempfile.gettempdir()) / f"nreadability_spark_{digest.hexdigest()[:16]}.zip"
    if not out.exists():
        tmp = out.with_suffix(".tmp")
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
            for p in py_files:
                zf.write(p, f"nreadability_spark/{p.relative_to(_PACKAGE_ROOT)}")
        os.replace(tmp, out)
    return str(out)


def get_spark(
    master=None,
    app_name="nreadability-spark",
    shuffle_partitions=None,
    arrow_batch_rows=512,
    extra_conf=None,
):
    """Build (or reuse) a tuned SparkSession with the package shipped."""
    from pyspark.sql import SparkSession

    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    if shuffle_partitions:
        builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    builder = (
        builder.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch_rows))
        .config("spark.ui.enabled", "false")
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.addPyFile(package_zip())
    return spark
