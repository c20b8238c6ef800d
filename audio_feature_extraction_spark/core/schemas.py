"""Fixed StructType schemas for every table the engine produces.

The reference validates shapes eagerly in ``__post_init__``
(design.md:117-149, 173-204); Spark's analog is a fixed schema plus a cheap
assertion pass (see operators/validate.py).
"""

from __future__ import annotations

from pyspark.sql import types as T

# canonical input table (BASELINE.json input_hint):
# (doc_id:string, tokens:array<int32>, n_tok:int32, source:string)
TOKEN_SEQUENCES = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType(), False), False),
        T.StructField("n_tok", T.IntegerType(), False),
        T.StructField("source", T.StringType(), False),
    ]
)

# long-format frame table (≙ SpectrogramData (n_frames, n_bins), design.md:151-221)
FRAMES = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("frame_id", T.IntegerType(), False),
        T.StructField("frame_tokens", T.ArrayType(T.IntegerType(), False), False),
    ]
)

FRAME_STATS = T.StructType(
    [
        T.StructField("mean", T.DoubleType(), True),
        T.StructField("std", T.DoubleType(), True),
        T.StructField("min", T.IntegerType(), True),
        T.StructField("max", T.IntegerType(), True),
        T.StructField("distinct_ratio", T.DoubleType(), True),
    ]
)

# frame feature table (≙ FeatureData, design.md:234-241)
FRAME_FEATURES = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("frame_id", T.IntegerType(), False),
        T.StructField("frame_tokens", T.ArrayType(T.IntegerType(), False), False),
        T.StructField("features", T.ArrayType(T.DoubleType(), False), False),
        T.StructField("stats", FRAME_STATS, False),
    ]
)

# per-partition lineage manifest (≙ ProcessingState + NFR-4.1 resume,
# design.md:243-253, tasks.md:789-810)
LINEAGE = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("doc_id_min", T.StringType(), True),
        T.StructField("doc_id_max", T.StringType(), True),
        T.StructField("rows", T.LongType(), False),
        T.StructField("frames", T.LongType(), True),
        T.StructField("checksum", T.LongType(), True),
        T.StructField("wall_ms", T.DoubleType(), True),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("props", T.StringType(), True),
    ]
)
