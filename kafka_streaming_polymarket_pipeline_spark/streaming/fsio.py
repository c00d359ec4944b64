"""Filesystem metadata I/O for the persistent streaming indexes, routed
through the Hadoop FileSystem API so index paths can live on ANY
Spark-reachable filesystem (local, HDFS, S3A, ABFS, DBFS), not just the
driver's local disk (r08 ADVICE: ``os.listdir`` discovery broke on
object-store URIs).

Design notes:

- Every helper resolves the filesystem FROM THE PATH via
  ``Path.getFileSystem`` on the active session's Hadoop configuration —
  a plain ``/tmp/...`` path hits ``RawLocalFileSystem`` (bit-identical
  behavior to the old ``os.*`` calls, which is what the streaming test
  suite pins), an ``s3a://...`` path hits whatever connector the
  cluster ships.
- These are METADATA ops (per-batch directory listings, the pinned
  ``_meta.json``, compaction staging): a few py4j round-trips per
  micro-batch, never per row.
- ``rename`` refuses an existing destination BEFORE calling Hadoop —
  ``FileSystem.rename`` would otherwise move the source INSIDE an
  existing destination directory on some implementations (POSIX-style),
  silently corrupting the compaction layout where ``os.rename`` raised.
- Object-store caveat the compaction protocol already absorbs: S3A's
  rename is a copy-then-delete, not atomic. The staged protocol
  (``_SUCCESS``-gated staging dir, originals deleted only after staging
  is complete, recovery on entry) never depends on rename atomicity —
  a crash mid-rename leaves a complete ``_SUCCESS``-ed staging dir and
  the recovery path finishes the move.
- ``sources/sinks.upsert_parquet``'s staging uses the same protocol on
  local paths; migrating it to these helpers is mechanical when an
  object-store deployment needs it.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_path(path: str):
    spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(
            "fsio needs an active SparkSession to resolve the filesystem "
            "for " + path
        )
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath, jvm


def exists(path: str) -> bool:
    fs, jpath, _ = _fs_path(path)
    return bool(fs.exists(jpath))


def is_dir(path: str) -> bool:
    fs, jpath, _ = _fs_path(path)
    return bool(fs.exists(jpath)) and bool(fs.getFileStatus(jpath).isDirectory())


def listdir(path: str) -> list[str]:
    """Child NAMES of a directory; [] when the path does not exist
    (callers guard with is_dir/exists where the distinction matters)."""
    fs, jpath, _ = _fs_path(path)
    if not fs.exists(jpath):
        return []
    return [st.getPath().getName() for st in fs.listStatus(jpath)]


def mkdirs(path: str) -> None:
    fs, jpath, _ = _fs_path(path)
    fs.mkdirs(jpath)


def delete(path: str) -> None:
    """Recursive delete; no-op when missing (shutil.rmtree call sites
    always checked existence first — folding the check in keeps the
    object-store version one round-trip)."""
    fs, jpath, _ = _fs_path(path)
    fs.delete(jpath, True)


def rename(src: str, dst: str) -> None:
    """Move ``src`` to ``dst``, refusing an existing destination (the
    ``os.rename`` contract the compaction protocol was written against —
    see module docstring for why this must be checked HERE)."""
    fs, jsrc, jvm = _fs_path(src)
    jdst = jvm.org.apache.hadoop.fs.Path(dst)
    if fs.exists(jdst):
        raise FileExistsError(f"rename destination exists: {dst}")
    if not fs.rename(jsrc, jdst):
        raise OSError(f"rename failed: {src} -> {dst}")


def read_text(path: str) -> str:
    fs, jpath, jvm = _fs_path(path)
    stream = fs.open(jpath)
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()


def write_text(path: str, text: str) -> None:
    fs, jpath, _ = _fs_path(path)
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def list_files_recursive(path: str) -> list[tuple[str, int]]:
    """All FILES under ``path`` recursively as (full path string, size
    bytes); [] when missing. Path strings are URI-style ('/'-separated
    on every filesystem), so callers parse partition dirs by splitting
    on '/'."""
    fs, jpath, _ = _fs_path(path)
    if not fs.exists(jpath):
        return []
    it = fs.listFiles(jpath, True)
    out: list[tuple[str, int]] = []
    while it.hasNext():
        st = it.next()
        out.append((st.getPath().toString(), int(st.getLen())))
    return out
