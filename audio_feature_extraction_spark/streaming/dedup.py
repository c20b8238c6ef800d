"""Streaming exact dedup — the online twin of
``operators/dedup.exact_dedup``.

The batch pass keeps one row (min doc_id) per distinct text over
history; the ONLINE pass admits each text's FIRST ARRIVAL and drops
every later copy, as documents stream in. The stream is grouped by the
text hash and run through ``applyInPandasWithState``:

* state = the keeper's doc_id for this hash (one small row per distinct
  text seen — the minimum possible for exact online dedup);
* within a micro-batch rows apply in doc_id order, so replaying a
  corpus in doc_id order through the stream reproduces the batch
  survivor set exactly (tested); out of order, first-arrival-wins is
  the standard online policy (the batch pass remains the backfill
  arbiter, same division of labor as streaming PIT vs the batch as-of
  join);
* emitted rows carry ``keeper_doc_id`` so a downstream auditor can
  distinguish "kept" (keeper == own id) without a second pass.

Scale shape: the shuffle is one hash exchange per micro-batch (what the
batch groupBy does once); state grows with DISTINCT texts — at corpus
scale back the state store with RocksDB and shard the stream by hash
range. A state TTL would bound memory at the cost of re-admitting a
text whose last copy aged out; exactness is the point here, so no TTL.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_STATE_SCHEMA = "keeper string"
DEDUP_OUT_SCHEMA = "doc_id string, text string, keeper_doc_id string"


def stream_exact_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Streaming (doc_id, text) -> first arrival per distinct text.

    Emits one row per admitted doc; duplicates (same md5(text) as an
    already-admitted doc, in this or any earlier micro-batch) are
    dropped. Admission order within a batch is doc_id order.
    """
    hashed = docs.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.col(text_col).alias("text"),
        F.md5(F.col(text_col)).alias("text_hash"),
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        keeper = state.get[0] if state.exists else None
        out = []
        # Arrow may split one hash group across several chunks
        # (maxRecordsPerBatch); sorting per-chunk would crown the FIRST
        # chunk's min doc_id. Materialize the whole group (it is one
        # distinct text — small by construction) and sort once so the
        # micro-batch's GLOBAL min doc_id is the keeper.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            whole = (
                pd.concat(chunks, ignore_index=True)
                if len(chunks) > 1
                else chunks[0]
            )
            for row in whole.sort_values("doc_id").itertuples(index=False):
                if keeper is None:
                    keeper = row.doc_id
                    out.append((row.doc_id, row.text, keeper))
                # else: duplicate of an admitted doc — dropped
        if keeper is not None:
            state.update((keeper,))
        if out:
            yield pd.DataFrame(
                out, columns=["doc_id", "text", "keeper_doc_id"]
            )

    return hashed.groupBy("text_hash").applyInPandasWithState(
        fn,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
