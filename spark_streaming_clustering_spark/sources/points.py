"""Point-stream sources in the reference's CSV format.

Format (batchStreamRun.scala:37,40,44-45; batchStreamModel.scala:46-51):
comma-separated doubles, positional — first ``dim`` columns are the
feature vector, then ``label`` (int), then ``id`` (line number).  The
reference infers ``dim`` from the first line minus labId=2 trailing
columns; we expose the same inference for batch reads and require an
explicit dim for streams (Structured Streaming needs a declared
schema before any file exists).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def point_csv_schema(dim: int) -> T.StructType:
    fields = [T.StructField(f"x{i}", T.DoubleType()) for i in range(dim)]
    fields.append(T.StructField("label", T.IntegerType()))
    fields.append(T.StructField("id", T.LongType()))
    return T.StructType(fields)


def _project(df: DataFrame, dim: int) -> DataFrame:
    """Positional slice -> (features, label, id) (pointToObjet, A5)."""
    return df.select(
        F.array(*[F.col(f"x{i}") for i in range(dim)]).alias("features"),
        F.col("label"),
        F.col("id"),
    )


def infer_dim(spark: SparkSession, path: str, lab_id: int = 2, sep: str = ",") -> int:
    """dim = width of the first line minus trailing label/id columns
    (batchStreamRun.scala:44-45)."""
    first = spark.read.text(path).limit(1).collect()
    if not first:
        raise ValueError(f"empty init file: {path}")
    return len(first[0][0].split(sep)) - lab_id


def read_points(
    spark: SparkSession, path: str, dim: int | None = None, sep: str = ","
) -> DataFrame:
    """Batch read (A1 + A4 + A5)."""
    dim = dim if dim is not None else infer_dim(spark, path, sep=sep)
    return _project(
        spark.read.schema(point_csv_schema(dim)).option("sep", sep).csv(path), dim
    )


def stream_points(
    spark: SparkSession,
    dir_path: str,
    dim: int,
    max_files_per_trigger: int = 1,
    sep: str = ",",
    glob: str | None = None,
    exclude_file: str | None = None,
) -> DataFrame:
    """Streaming file source (A2): new files in dir become micro-batches,
    like the reference's ``ssc.textFileStream`` (batchStreamRun.scala:40).

    ``glob`` (pathGlobFilter; Hadoop glob syntax incl. ``{csv,txt}``
    alternation) plus ``exclude_file`` (a basename filtered out via the
    ``_metadata.file_path`` column) let a CLI run watch the same
    directory the init file lives in without re-ingesting it —
    textFileStream only saw files created after start; the Structured
    Streaming file source processes pre-existing files too.  The
    reference's datasets are ``.txt`` batch files next to ``nodes2.txt``
    (README.md:4), so an extension-only glob cannot express the
    exclusion by itself.
    """
    reader = (
        spark.readStream.schema(point_csv_schema(dim))
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("sep", sep)
    )
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.csv(dir_path)
    if exclude_file is not None:
        df = df.select("*", F.col("_metadata.file_path").alias("_src")).filter(
            ~F.col("_src").endswith("/" + exclude_file)
        )
    return _project(df, dim)


def stream_points_socket(
    spark: SparkSession, host: str, port: int, dim: int, sep: str = ","
) -> DataFrame:
    """Socket text source (A3 — present but commented out in the
    reference, batchStreamRun.scala:42: ``ssc.socketTextStream``).

    Lines arrive as separator-joined doubles in the reference's
    positional layout; parsed with split + element casts (A4/A5).
    Socket offsets are not replayable, so this source is for demos and
    tests — production ingestion should use the file source (A2) or a
    replayable bus behind the same (features, label, id) schema.
    """
    raw = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )
    parts = F.split(F.col("value"), sep)
    return raw.select(
        F.transform(F.slice(parts, 1, dim), lambda x: x.cast("double")).alias(
            "features"
        ),
        parts[dim].cast("int").alias("label"),
        parts[dim + 1].cast("long").alias("id"),
    )
