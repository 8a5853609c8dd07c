"""Executor-visible staging locations for intermediate tables.

Several operators materialize a mid-pipeline frame to parquet so an
expensive prefix (tokenize -> shingle -> df -> sort) runs once while
feeding multiple consumers, without `persist()`'s
can't-unpersist-a-lazy-result leak (round-12 ADVICE). A staging write
is only correct if the path is visible to EVERY executor AND the
driver — `tempfile.mkdtemp()` is driver-local, so on a multi-node
cluster each executor would write to its own node-local disk and the
staged table would be incomplete (round-13 ADVICE, medium).

Resolution order (first hit wins):

1. an explicit caller-provided ``staging_dir`` — the production path:
   point it at the job's scratch prefix on the shared filesystem
   (S3/HDFS/NFS), same place you'd put a checkpoint;
2. the SparkContext checkpoint dir (``sc.setCheckpointDir``) — by
   Spark's own contract this must be cluster-visible;
3. a driver-local tempdir — correct ONLY where driver and executors
   share a filesystem, i.e. ``local[*]`` or a shared mount; this is
   the test/dev fallback, not the cluster path.

Cleanup is deferred to interpreter exit (the caller may collect the
returned lazy frame long after the operator returns) and goes through
the Hadoop FileSystem API so non-posix schemes (s3a://, hdfs://) are
deleted too; a dead JVM at exit downgrades cleanup to best-effort,
which is the normal contract for scratch prefixes.
"""

from __future__ import annotations

import atexit
import uuid

from pyspark.sql import SparkSession

__all__ = ["resolve_staging"]


def _hadoop_rm(spark: SparkSession, path: str) -> None:
    try:
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        fs.delete(hpath, True)
    except Exception:
        # JVM already gone at interpreter exit, or the scheme's FS is
        # unreachable: scratch-prefix cleanup is best-effort
        pass


def resolve_staging(
    spark: SparkSession, prefix: str, staging_dir: str | None = None
) -> str:
    """Return a fresh executor-visible directory path for one staged
    table and register its deletion at interpreter exit. See module
    docstring for the resolution order."""
    if staging_dir is None:
        try:
            staging_dir = spark.sparkContext.getCheckpointDir()
        except Exception:
            staging_dir = None
    if staging_dir is not None:
        path = f"{staging_dir.rstrip('/')}/{prefix}{uuid.uuid4().hex}"
        atexit.register(_hadoop_rm, spark, path)
        return path
    import shutil
    import tempfile

    master = spark.sparkContext.master or ""
    if not master.startswith("local"):
        # a driver-local tempdir on a real cluster reintroduces the
        # incomplete-staged-table bug this module exists to prevent:
        # each executor writes to ITS node-local disk (round-15 ADVICE
        # — fail loudly instead of staging silently incomplete data)
        raise RuntimeError(
            f"resolve_staging: no staging_dir given and no checkpoint "
            f"dir set, but master={master!r} is not local — a driver-"
            f"local tempdir is not visible to remote executors. Pass "
            f"staging_dir= (shared-FS scratch prefix) or call "
            f"sc.setCheckpointDir() first."
        )
    path = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    return path
