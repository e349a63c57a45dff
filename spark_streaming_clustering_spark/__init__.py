"""PySpark-native analytics + streaming-clustering engine.

A from-scratch, Spark-first re-expression of the capability surface of the
reference G-Stream implementation (mghesmoune/spark-streaming-clustering):
micro-batch Growing Neural Gas clustering of numeric point streams, plus a
full relational query surface and large-scale training-data pipeline
operators (dedup, similarity search, text analysis, multimodal columns).

Layout:
    session     SparkSession factory tuned for local[32] tests / cluster scale
    sources     parquet/CSV/stream readers for the test tables & point format
    functions   column-expression kernels (vector math, text, hashing)
    operators   relational query builders, assignment step, dedup, ANN, text
    plans       plan-inspection helpers (pushdown / broadcast / codegen audits)
    streaming   G-Stream model state machine + batch & structured-stream trainers
"""

__version__ = "0.1.0"
