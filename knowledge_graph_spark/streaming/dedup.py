"""Streaming exact dedup — state-backed first-seen filter.

The batch dedup family (beyond/dedup.py) assumes a full corpus scan; an
ingestion stream needs the same decision online: has this fingerprint been
seen before? ``applyInPandasWithState`` keyed by fingerprint holds one tiny
state cell per distinct document; the operator emits each first occurrence
and counts suppressed duplicates.

Scale: state is hash-partitioned by fingerprint across executors; with a
RocksDB state store the keyed state comfortably exceeds memory. TTL-style
eviction (timeout) is the knob for bounded-recall dedup windows.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

DEDUP_OUTPUT = StructType(
    [
        StructField("fingerprint", StringType(), False),
        StructField("first_doc_id", LongType(), False),
        StructField("n_duplicates_so_far", LongType(), False),
    ]
)

_STATE = StructType(
    [
        StructField("first_doc_id", LongType(), False),
        StructField("n_seen", LongType(), False),
    ]
)


def dedup_stream(docs: DataFrame, prefix_tokens: int = 5) -> DataFrame:
    """docs(doc_id, text) stream → one row per fingerprint per batch it
    appears in: the kept doc_id + duplicates suppressed so far."""
    keyed = docs.select(
        F.md5(
            F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, prefix_tokens))
        ).alias("fingerprint"),
        "doc_id",
    )

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (fp,) = key
        ids: list[int] = []
        for pdf in pdfs:
            ids.extend(int(x) for x in pdf["doc_id"])
        if not ids:
            return
        ids.sort()
        if state.exists:
            first, n_seen = state.get
        else:
            first, n_seen = ids[0], 0
        n_seen += len(ids)
        state.update((first, n_seen))
        yield pd.DataFrame(
            {
                "fingerprint": [fp],
                "first_doc_id": [first],
                "n_duplicates_so_far": [n_seen - 1],
            }
        )

    return keyed.groupBy("fingerprint").applyInPandasWithState(
        update,
        outputStructType=DEDUP_OUTPUT,
        stateStructType=_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
