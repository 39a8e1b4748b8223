"""Filesystem metadata ops through the Hadoop FileSystem API.

Driver-side listing/deletion for state ledgers and layout reports.  Going
through ``org.apache.hadoop.fs.FileSystem`` (the same abstraction every
Spark read/write already uses, reached over the live JVM gateway) instead
of ``os``/``shutil``/``glob`` means a ``state_path`` or dataset path can
be ANY URI the cluster's Hadoop conf can resolve -- ``hdfs://``,
``s3a://``, ``abfss://``, ``file://``, or a bare local path -- not just a
driver-local POSIX directory.  On object stores each call maps to the
LIST/DELETE the store actually serves; there is no POSIX emulation layer
to lie about atomicity.

Everything here is metadata-scale (names + lengths, never file contents),
so a driver-side loop is the right shape: a ledger holds a handful of
versions and a partition report is one LIST per dataset -- the same
driver-side manifest walk a lakehouse table format performs at commit
time.
"""

from __future__ import annotations

import io

from pyspark.sql import SparkSession


def jpath(spark: SparkSession, path: str):
    """A ``org.apache.hadoop.fs.Path`` for ``path`` (URI or local)."""
    return spark._jvm.org.apache.hadoop.fs.Path(path)


def filesystem(spark: SparkSession, path: str):
    """The FileSystem that owns ``path``, resolved against the session's
    Hadoop configuration (so ``s3a://`` credentials, ``fs.defaultFS``
    etc. all apply exactly as they do for ``spark.read``)."""
    return jpath(spark, path).getFileSystem(
        spark._jsc.hadoopConfiguration()
    )


def qualified(spark: SparkSession, path: str) -> str:
    """``path`` as the filesystem's fully-qualified URI string (e.g.
    ``/tmp/x`` -> ``file:/tmp/x``) -- the stable base for computing
    relative child paths."""
    fs = filesystem(spark, path)
    return fs.makeQualified(jpath(spark, path)).toString()


def exists(spark: SparkSession, path: str) -> bool:
    return filesystem(spark, path).exists(jpath(spark, path))


def child_dir_names(spark: SparkSession, path: str) -> list[str]:
    """Names (not paths) of the immediate sub-directories of ``path``;
    [] when ``path`` does not exist.  One LIST call."""
    fs = filesystem(spark, path)
    p = jpath(spark, path)
    if not fs.exists(p):
        return []
    return [
        st.getPath().getName()
        for st in fs.listStatus(p)
        if st.isDirectory()
    ]


def delete_recursive(spark: SparkSession, path: str) -> bool:
    """Recursive delete; False when the path was already absent."""
    fs = filesystem(spark, path)
    p = jpath(spark, path)
    if not fs.exists(p):
        return False
    return fs.delete(p, True)


def list_files(
    spark: SparkSession, path: str, suffix: str = ""
) -> list[tuple[str, int]]:
    """All regular files under ``path`` (recursive), as sorted
    ``(relative_path, size_bytes)`` pairs.  Uses ``FileSystem.listFiles``
    -- on HDFS a streamed recursive listing, on S3A a flat keyspace LIST,
    both without one RPC per directory."""
    fs = filesystem(spark, path)
    p = jpath(spark, path)
    if not fs.exists(p):
        return []
    base = fs.makeQualified(p).toString().rstrip("/")
    out: list[tuple[str, int]] = []
    it = fs.listFiles(p, True)
    while it.hasNext():
        st = it.next()
        full = st.getPath().toString()
        rel = full[len(base) + 1 :] if full.startswith(base + "/") else full
        if suffix and not rel.endswith(suffix):
            continue
        out.append((rel, st.getLen()))
    return sorted(out)


def write_text(spark: SparkSession, path: str, content: str) -> None:
    """Write a small text file (overwrite) through the Hadoop FS API --
    used for ledger marker files, so markers live wherever the state
    lives (hdfs://, s3a://, file://)."""
    fs = filesystem(spark, path)
    out = fs.create(jpath(spark, path), True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()


class HadoopBinaryFile(io.RawIOBase):
    """Read-only seekable Python file object over a Hadoop
    ``FSDataInputStream`` -- lets byte-level readers (pyarrow parquet
    footer decoding in :func:`sources.layout.file_stats`) work against
    ANY URI the session's Hadoop conf resolves, not just local paths.

    Shape: each ``read(n)`` is one positioned read on the underlying
    stream (seek + bounded ``IOUtils.toByteArray``), crossing the JVM
    gateway once per call.  Right for METADATA reads -- a parquet footer
    is a handful of small tail reads -- wrong for bulk data (which
    belongs in ``spark.read``, never a driver loop)."""

    def __init__(self, spark: SparkSession, path: str):
        super().__init__()
        self._spark = spark
        fs = filesystem(spark, path)
        p = jpath(spark, path)
        self._size = int(fs.getFileStatus(p).getLen())
        self._stream = fs.open(p)
        self._pos = 0

    def readable(self) -> bool:
        return True

    def seekable(self) -> bool:
        return True

    def tell(self) -> int:
        return self._pos

    def size(self) -> int:
        return self._size

    def seek(self, offset: int, whence: int = io.SEEK_SET) -> int:
        if whence == io.SEEK_SET:
            pos = offset
        elif whence == io.SEEK_CUR:
            pos = self._pos + offset
        elif whence == io.SEEK_END:
            pos = self._size + offset
        else:
            raise ValueError(f"unsupported whence {whence}")
        if pos < 0:
            # fail HERE with the io contract's error, not later with an
            # opaque Py4J EOFException out of the JVM stream seek
            raise ValueError(f"negative seek position {pos}")
        self._pos = pos
        return self._pos

    def read(self, n: int = -1) -> bytes:
        if n is None or n < 0:
            n = self._size - self._pos
        n = min(n, self._size - self._pos)
        if n <= 0:
            return b""
        self._stream.seek(self._pos)
        data = bytes(
            self._spark._jvm.org.apache.commons.io.IOUtils.toByteArray(
                self._stream, n
            )
        )
        self._pos += len(data)
        return data

    def close(self) -> None:
        try:
            if not self.closed:
                self._stream.close()
        finally:
            super().close()


def read_text(spark: SparkSession, path: str) -> str | None:
    """Read a small text file; None when absent."""
    fs = filesystem(spark, path)
    p = jpath(spark, path)
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        return spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()
