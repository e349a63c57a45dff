"""House cross-engine determinism idioms, shared by the surface modules.

Extracted from pipeline_surface (which re-exports them for backward
compatibility) so that surface modules can import them without pulling
the whole pipeline module into a registry import cycle: every surface
module imports ``registry``, and registry imports every surface module,
so any DIRECT cross-surface value import must come from a leaf module
like this one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

STOPWORDS = ("the", "a", "of", "to", "and", "in")

_SW = ", ".join(f"'{w}'" for w in STOPWORDS)


def _hash28(col) -> F.Column:
    """28-bit cross-engine string hash: first 7 hex chars of md5."""
    return F.conv(F.substring(F.md5(col), 1, 7), 16, 10).cast("bigint")


def _tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("tok")
    )


# --- shared DuckDB fragments ----------------------------------------------
_DK_HASH = "CAST(('0x' || substr(md5({c}), 1, 7)) AS BIGINT)"
_DK_DVEC = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
_DK_DOT = "list_sum(list_transform(list_zip({a}, {b}), p -> p[1]*p[2]))"
_DK_NORM = "sqrt(list_sum(list_transform({a}, x -> x*x)))"
