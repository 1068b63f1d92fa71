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
