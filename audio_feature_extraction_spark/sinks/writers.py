"""Dataset writers — the 4 output layouts + split/append/metadata.

≙ HDF5DatasetWriter (design.md:1301-1447): the reference materializes
per-sample tensors in one of 4 channel layouts (DatasetFormat,
design.md:1246-1264) with reconstruction metadata attrs; we write
parquet partitioned by split with the same 4 schemas and a JSON metadata
sidecar column (≙ HDF5 attrs, design.md:1369-1396).

Layouts over the frame-feature table (T=frames, F=buckets analogs):

* COMPLEX          — 2ch: (features, stats-vector)        [real, imag]
* MAGNITUDE_PHASE  — 2ch: (features, phase-analog = normalized position)
* MAGNITUDE_PHASE_TRIG — 3ch: features + cos/sin of the phase analog
  (default; design.md:1251)
* MAGNITUDE_ONLY   — 1ch: features

Scale: `partitionBy('split')` gives partition pruning on read;
sequential sample keys (design.md:1355) come from a zipWithIndex-free
window only within small outputs — at scale keys are
``(split, doc_id, frame_id)`` natural keys, and the sequential-key
writer is reserved for export-sized slices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

FORMATS = (
    "complex",
    "magnitude_phase",
    "magnitude_phase_trig",
    "magnitude_only",
)


def _phase_expr() -> str:
    """Phase analog: frame position angle in [0, 2π) from frame_id and the
    per-doc frame count (≙ phase channel, design.md:574)."""
    return (
        "2.0 * pi() * (cast(frame_id as double) / "
        "cast(max(frame_id) over (partition by doc_id) + 1 as double))"
    )


def create_channels(features: DataFrame, fmt: str = "magnitude_phase_trig") -> DataFrame:
    """≙ _create_channels (design.md:1409-1447): stack per-frame channel
    arrays into a channels struct."""
    if fmt not in FORMATS:
        raise ValueError(f"format must be one of {FORMATS}, got {fmt!r}")
    df = features.withColumn("_phase", F.expr(_phase_expr()))
    stats_vec = F.array(
        F.col("stats.mean"),
        F.col("stats.std"),
        F.col("stats.min").cast("double"),
        F.col("stats.max").cast("double"),
        F.col("stats.distinct_ratio"),
    )
    if fmt == "complex":
        ch = F.struct(
            F.col("features").alias("real"), stats_vec.alias("imag")
        )
    elif fmt == "magnitude_phase":
        ch = F.struct(
            F.col("features").alias("magnitude"),
            F.expr("transform(features, x -> _phase)").alias("phase"),
        )
    elif fmt == "magnitude_phase_trig":
        ch = F.struct(
            F.col("features").alias("magnitude_db"),
            F.expr("transform(features, x -> cos(_phase))").alias("phase_cos"),
            F.expr("transform(features, x -> sin(_phase))").alias("phase_sin"),
        )
    else:  # magnitude_only
        ch = F.struct(F.col("features").alias("magnitude"))
    return df.select(
        "doc_id", "frame_id", ch.alias("channels"), F.col("_phase").alias("phase")
    )


def write_dataset(
    features: DataFrame,
    out_dir: str,
    fmt: str = "magnitude_phase_trig",
    split_col: str | None = None,
    mode: str = "overwrite",
    frame_len: int = 16,
    hop: int = 8,
    store_tokens: bool = True,
    snapshot: bool = False,
) -> None:
    """≙ HDF5DatasetWriter.write (design.md:1301-1407): channels + a
    metadata sidecar (reconstruction params as JSON — HDF5-attr analog).

    ``store_tokens=True`` keeps ``frame_tokens`` in the dataset so the
    exact inverse runs from the written files alone — the reference's
    "full reconstruction metadata" contract (design.md:1601-1622).

    ``snapshot=True`` commits through the atomic snapshot table layer
    (sinks/snapshots.py): readers never see a partial dataset and every
    write is time-travelable; ``split_col`` then stays a plain column
    (snapshot manifests supersede directory partitioning for pruning at
    the metadata level)."""
    ch = create_channels(features, fmt)
    if store_tokens and "frame_tokens" in features.columns:
        ch = ch.join(
            features.select("doc_id", "frame_id", "frame_tokens"),
            ["doc_id", "frame_id"],
        )
    meta = F.to_json(
        F.struct(
            F.lit(fmt).alias("format"),
            F.lit(frame_len).alias("frame_len"),
            F.lit(hop).alias("hop"),
        )
    )
    out = ch.withColumn("metadata", meta)
    if snapshot:
        from audio_feature_extraction_spark.sinks import snapshots as sn

        sn.write_snapshot(
            out, out_dir, mode="append" if mode == "append" else "overwrite"
        )
    else:
        writer = out.write.mode(mode)
        if split_col is not None:
            writer = writer.partitionBy(split_col)
        writer.parquet(out_dir)
    # JSON sidecar (S8, requirements.md:65-69) — the HDF5-attrs analog as
    # a single dataset-level manifest file
    import json
    import os

    sidecar = {
        "format": fmt,
        "frame_len": frame_len,
        "hop": hop,
        "n_channels": {"complex": 2, "magnitude_phase": 2,
                       "magnitude_phase_trig": 3, "magnitude_only": 1}[fmt],
        "schema": out.schema.jsonValue(),
    }
    with open(os.path.join(out_dir, "_dataset_metadata.json"), "w") as f:
        json.dump(sidecar, f, indent=2)


def reconstruct_from_dataset(spark, dataset_dir: str) -> DataFrame:
    """≙ AudioReconstructor.reconstruct_from_dataset (design.md:1581-1631):
    read the written dataset, recover frame params from its metadata,
    and run the exact inverse — no access to the original table needed."""
    import json
    import os

    from audio_feature_extraction_spark.core.config import FrameSpec
    from audio_feature_extraction_spark.operators import inverse

    with open(os.path.join(dataset_dir, "_dataset_metadata.json")) as f:
        meta = json.load(f)
    spec = FrameSpec(frame_len=meta["frame_len"], hop=meta["hop"])
    if os.path.exists(os.path.join(dataset_dir, "_current")):
        from audio_feature_extraction_spark.sinks import snapshots as sn

        ds = sn.read_snapshot(spark, dataset_dir)
    else:
        ds = spark.read.parquet(dataset_dir)
    if "frame_tokens" not in ds.columns:
        raise ValueError(
            "dataset was written with store_tokens=False — exact "
            "reconstruction requires frame_tokens"
        )
    return inverse.reconstruct(ds.select("doc_id", "frame_id", "frame_tokens"), spec)


def with_sample_keys(df: DataFrame, order_cols: list[str]) -> DataFrame:
    """Sequential 'sample_%06d' keys (design.md:1355). Global window —
    export-sized outputs only (documented scale caveat above)."""
    w = Window.orderBy(*order_cols)
    return df.withColumn(
        "sample_key",
        F.format_string("sample_%06d", F.row_number().over(w) - 1),
    )


def append_samples(
    existing_dir: str, new_df: DataFrame, order_cols: list[str]
) -> DataFrame:
    """Incremental append with auto-increment keys (TASK-024,
    tasks.md:765-785): continue numbering after the current max key."""
    spark = new_df.sparkSession
    try:
        existing = spark.read.parquet(existing_dir)
        start = (
            existing.agg(
                F.max(F.regexp_extract("sample_key", r"(\d+)", 1).cast("long"))
            ).collect()[0][0]
            or -1
        ) + 1
    except Exception:
        start = 0
    w = Window.orderBy(*order_cols)
    keyed = new_df.withColumn(
        "sample_key",
        F.format_string("sample_%06d", F.row_number().over(w) - 1 + F.lit(start)),
    )
    keyed.write.mode("append").parquet(existing_dir)
    return keyed
