"""Streaming NEAR-dup admission — the online twin of MinHash-LSH dedup
(``operators/dedup.lsh_candidate_pairs`` + survivor selection).

Online policy (the standard one for ingest-time filtering): a document
is a near-duplicate if ANY of its LSH band buckets is already owned by
an earlier document; otherwise it is admitted and claims every bucket
it touched first.  Buckets claimed by a document that itself got
dropped STAY claimed — a copy of a near-duplicate is also a
near-duplicate (tested).

Dataflow (all stateless until the single stateful exchange):

* signature: the SAME JVM-side minhash expression the batch path uses
  (``operators/dedup.minhash_signatures`` — no Python in the row path),
* band explode: ``lsh_band_keys`` (b rows per doc),
* one ``applyInPandasWithState`` keyed on (band, band_key): state =
  the bucket's first owner (one small row per DISTINCT bucket ever
  seen); within a micro-batch rows apply in doc_id order, so replaying
  in doc_id order reproduces the sequential-scan batch witness exactly
  (property-tested against an independent python witness in
  tests/test_streaming_neardup.py).

The operator emits per-BUCKET fragments ``(doc_id, band, owner_doc_id,
fresh)``; the per-doc verdict is a stateless aggregation of the b
fragments (:func:`near_dup_verdicts`) — a doc is dropped iff any of
its buckets has ``owner != doc``.  Emitting fragments instead of
verdicts keeps the stateful stage single-key (bucket) and lets the
sink choose its own admission policy (e.g. majority-of-bands instead
of any-band).

Scale shape: the shuffle is one (band, band_key) exchange per
micro-batch — identical keys to the batch LSH bucket join; state is
one row per distinct bucket (RocksDB-backed at corpus scale).  No TTL:
re-admitting an aged-out near-dup would silently re-introduce
duplicates; the batch pass stays the periodic arbiter.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from audio_feature_extraction_spark.core.config import MinHashSpec
from audio_feature_extraction_spark.operators.dedup import (
    DEFAULT_MINHASH,
    lsh_band_keys,
    minhash_signatures,
)

NEARDUP_STATE_SCHEMA = "owner string"
NEARDUP_OUT_SCHEMA = (
    "doc_id string, band int, owner_doc_id string, fresh boolean"
)


def stream_lsh_near_dup(
    tokseq: DataFrame, spec: MinHashSpec = DEFAULT_MINHASH
) -> DataFrame:
    """Streaming (doc_id, tokens) -> per-bucket ownership fragments.

    ``fresh`` is true when this doc claimed the bucket (first arrival in
    stream history); ``owner_doc_id`` is the bucket's owner after this
    micro-batch.  Aggregate with :func:`near_dup_verdicts`.
    """
    bands = lsh_band_keys(
        minhash_signatures(tokseq, spec), spec
    ).select(
        F.col("doc_id").cast("string").alias("doc_id"), "band", "band_key"
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        owner = state.get[0] if state.exists else None
        out = []
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            whole = (
                pd.concat(chunks, ignore_index=True)
                if len(chunks) > 1
                else chunks[0]
            )
            # global doc_id order within the micro-batch (chunk-safe,
            # same discipline as stream_exact_dedup)
            for row in whole.sort_values("doc_id").itertuples(index=False):
                if owner is None:
                    owner = row.doc_id
                    out.append((row.doc_id, row.band, owner, True))
                else:
                    out.append((row.doc_id, row.band, owner, False))
        if owner is not None:
            state.update((owner,))
        if out:
            yield pd.DataFrame(
                out, columns=["doc_id", "band", "owner_doc_id", "fresh"]
            )

    return bands.groupBy("band", "band_key").applyInPandasWithState(
        fn,
        outputStructType=NEARDUP_OUT_SCHEMA,
        stateStructType=NEARDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def near_dup_verdicts(fragments: DataFrame) -> DataFrame:
    """(doc_id, is_near_dup, n_foreign_buckets, n_buckets) from the
    per-bucket fragments — stateless, runs on the sink side (a doc's b
    fragments land in the doc's own micro-batch).  ``is_near_dup`` is
    the any-band policy: some bucket is owned by another doc."""
    return fragments.groupBy("doc_id").agg(
        F.max(
            (F.col("owner_doc_id") != F.col("doc_id")).cast("int")
        ).cast("boolean").alias("is_near_dup"),
        F.sum(
            (F.col("owner_doc_id") != F.col("doc_id")).cast("int")
        ).alias("n_foreign_buckets"),
        F.count("*").alias("n_buckets"),
    )


def sequential_witness(
    band_rows: list[tuple[str, int, str]], order: list[str]
) -> dict[str, bool]:
    """Independent sequential-scan reference for the ADMISSION
    semantics: given the engine-computed band keys ``(doc_id, band,
    band_key)`` (from the batch ``lsh_band_keys`` — the identical
    expression the stream runs) and a processing ``order`` of doc ids,
    claim buckets one doc at a time and flag near-dups.  Returns
    doc_id -> is_near_dup.  The hash arithmetic is the engine's own
    (single source of truth); only the claim/flag state machine is
    re-derived here, which is exactly what the streaming operator adds
    on top of the batch expressions.
    """
    by_doc: dict[str, list[tuple[int, str]]] = {}
    for doc_id, band, band_key in band_rows:
        by_doc.setdefault(doc_id, []).append((band, band_key))
    owners: dict[tuple[int, str], str] = {}
    verdict: dict[str, bool] = {}
    for doc_id in order:
        keys = by_doc.get(doc_id, [])
        verdict[doc_id] = any(
            owners.get(k) not in (None, doc_id) for k in keys
        )
        for k in keys:
            owners.setdefault(k, doc_id)
    return verdict
