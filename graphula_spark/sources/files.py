"""Per-file distributed reads for document-scoped formats.

Turtle/TriG, RDF/XML and WARC are stateful per file, so the natural
parallel unit is one task per file. `sc.binaryFiles` looks like the
right tool but silently under-parallelizes many-small-file corpora:
its split sizing adds `spark.files.openCostInBytes` (4 MB) per file to
the byte total, then packs splits by the files' ACTUAL sizes — 64
small crawl files collapse into 2 tasks on a 32-core session (measured
here), and `minPartitions` cannot fix it because the same math
swallows it.

`per_file_rdd` instead globs the pattern driver-side through the
Hadoop FileSystem API (so hdfs:// and s3a:// work like file://) and
parallelizes the PATH LIST with one partition per file; each task
opens its own file through pyarrow.fs. One file = one task, exactly,
at 64 files or 64k.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def glob_paths(spark: SparkSession, paths: str | list[str]) -> list[str]:
    """Expand glob pattern(s) via the Hadoop FileSystem (scheme-aware);
    directories expand to their (non-hidden) files."""
    if isinstance(paths, str):
        paths = [paths]
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    out: list[str] = []
    for pattern in paths:
        jpath = jvm.org.apache.hadoop.fs.Path(pattern)
        fs = jpath.getFileSystem(conf)
        statuses = fs.globStatus(jpath)
        if statuses is None:
            continue
        for st in statuses:
            if st.isDirectory():
                for child in fs.listStatus(st.getPath()):
                    name = child.getPath().getName()
                    if not child.isDirectory() and not name.startswith(
                        ("_", ".")
                    ):
                        out.append(child.getPath().toString())
            else:
                out.append(st.getPath().toString())
    return sorted(out)


def _read_file_bytes(path: str) -> bytes:
    """Executor-side whole-file read via pyarrow.fs (local/S3/HDFS)."""
    import pyarrow.fs as pafs

    if path.startswith("file:"):
        local = path[5:]
        while local.startswith("//"):  # file:///x and file:/x both occur
            local = local[1:]
        fs: pafs.FileSystem = pafs.LocalFileSystem()
        path = local
    elif "://" in path:
        fs, path = pafs.FileSystem.from_uri(path)
    else:
        fs = pafs.LocalFileSystem()
    with fs.open_input_stream(path) as f:
        return f.read()


def per_file_rdd(spark: SparkSession, paths: str | list[str]):
    """RDD of (path, file_bytes) with EXACTLY one partition per file."""
    files = glob_paths(spark, paths)
    if not files:
        raise FileNotFoundError(f"no files match {paths!r}")
    return spark.sparkContext.parallelize(files, len(files)).map(
        lambda p: (p, _read_file_bytes(p))
    )
