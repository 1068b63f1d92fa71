"""Custom stateful streaming operators via applyInPandasWithState —
the extension point for operators Structured Streaming lacks natively
(the streaming analog of the reference's coprocessor endpoints).

Provided: per-key running aggregates (count/sum carried across
micro-batches in group state). The same pattern carries session state,
dedup windows, or rate limiting.
"""

from __future__ import annotations

from typing import Iterable, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, total_events long, total_value double"
STATE_SCHEMA = "count long, sum double"


def _update_running(
    key: Tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        count, total = state.get
    else:
        count, total = 0, 0.0
    for pdf in pdfs:
        count += len(pdf)
        total += float(pdf["value"].sum())
    state.update((count, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "total_events": [count], "total_value": [total]}
    )


def running_totals(events: DataFrame) -> DataFrame:
    """Streaming per-user running (count, sum) with state carried across
    micro-batches. ``events`` needs columns user_id, value."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_running,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


DEDUP_OUTPUT_SCHEMA = "fingerprint string, doc_id long, text string"
DEDUP_STATE_SCHEMA = "seen long"


def _dedup_group(
    key: Tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (fp,) = key
    first = None
    for pdf in pdfs:
        if len(pdf) and first is None:
            row = pdf.sort_values("doc_id").iloc[0]
            first = (int(row["doc_id"]), str(row["text"]))
    if state.exists or first is None:
        # fingerprint already emitted in an earlier batch -> drop
        if first is not None:
            state.update((1,))
        yield pd.DataFrame(columns=["fingerprint", "doc_id", "text"])
        return
    state.update((1,))
    yield pd.DataFrame(
        {"fingerprint": [fp], "doc_id": [first[0]], "text": [first[1]]}
    )


def streaming_exact_dedup(docs: DataFrame) -> DataFrame:
    """Streaming exact dedup: emit each content fingerprint's FIRST
    document only, across all micro-batches (state = seen fingerprints).
    ``docs`` needs columns fingerprint, doc_id, text — compute the
    fingerprint upstream with operators.text.fingerprint. The standard
    dedup-on-ingest primitive for a continuously arriving corpus."""
    return docs.groupBy("fingerprint").applyInPandasWithState(
        _dedup_group,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
