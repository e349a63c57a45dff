"""Shared text-shingling helpers used by pipeline_surface and
analytics_surface (kept import-cycle-free: depends only on sources).

``_shingles`` / ``_DK_SHINGLES`` are the single definition of the
3-token shingle relation both the Spark builders and the DuckDB
oracles are written against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

_DK_SHINGLES = """
  SELECT doc_id, unnest(generate_series(1, greatest(len(t) - 2, 0))) AS pos,
         unnest(list_transform(generate_series(1, greatest(len(t) - 2, 0)),
                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
"""


def _shingles(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """(doc_id, pos, sh): k-token shingles with 1-based position."""
    docs = load_table(spark, sf_dir, "documents")
    # Materialize the token array as a bound column first: referencing
    # F.split(...) inside the lambda would re-split the text for every
    # shingle element (3 evaluations x ~tokens elements = O(tokens^2)).
    toks = docs.select("doc_id", F.split("text", " ").alias("t"))
    t = F.col("t")
    sh = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(t) - (k - 1), F.lit(0))),
        lambda i: F.concat_ws(" ", t[i - 1], t[i], t[i + 1]),
    )
    return toks.select("doc_id", F.posexplode(sh).alias("pos0", "sh")).select(
        "doc_id", (F.col("pos0") + 1).alias("pos"), "sh"
    )
