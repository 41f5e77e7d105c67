"""stream_processing_system_spark — a PySpark-native analytics engine.

A brand-new, idiomatic Spark (DataFrame / SQL / Structured Streaming)
engine reproducing the *capabilities* of the reference system
"Crane" (beado123/stream_processing_system, UIUC CS425 Fa18 MP4):
file/CSV/log ingestion, projection, filtering, tokenization, grouped
aggregation, top-k, and drain-and-stop streaming — plus the
large-scale training-data-pipeline operators a 100 TB deployment
needs (dedup, similarity search, text analysis, multimodal plumbing).

Design stance (see SURVEY.md §7):
- Declarative DataFrame/SQL plans; Catalyst + Tungsten choose the
  physical strategy. No hand-scheduled topologies.
- Built-in `pyspark.sql.functions` in every hot path; Pandas UDFs
  only where built-ins can't express the semantics (multimodal
  decode, custom streaming state).
- Every operator is shuffle-aware: partial aggregation, broadcast
  joins for small dims, no driver-side collection inside operators.
"""

from stream_processing_system_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
