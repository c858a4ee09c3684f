"""kinesis_stream_video_project_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
semantics of the reference repo ``iAstronaut/Kinesis-Stream-Video-Project``
(a bash RTSP->AWS Kinesis Video Streams watchdog, ``/root/reference``),
generalized into a full analytics engine:

* relational operators (scan/filter/project/join/agg/window/setop/subquery)
  expressed on the DataFrame API so Catalyst plans them (predicate pushdown,
  column pruning, broadcast joins, AQE),
* the reference's watchdog semantics (tumbling-window health aggregation,
  consecutive-failure counting, escalation state machine — restart.sh:68-158)
  as both oracle-checkable batch queries and Structured Streaming jobs,
* LLM-data-pipeline operators: dedup (exact/MinHash/SimHash/Jaccard/embedding),
  similarity search, text analysis, multimodal column plumbing.

Public entry points live in :mod:`.plans.registry` (the query registry that
``__spark_entry__.py`` exports) and :mod:`.session` / :mod:`.io`.
"""

from kinesis_stream_video_project_spark.session import get_spark  # noqa: F401
from kinesis_stream_video_project_spark.io import load_table, register_views  # noqa: F401

__version__ = "0.1.0"
