"""Coprocessor-endpoint analog — arbitrary distributed computation over
a table's partitions, the HBase extension surface re-expressed.

Reference: coprocessor Endpoints are per-region protobuf services the
client fans out over a key range and merges
(`HTable.coprocessorService`, hbase-client/.../client/HTable.java:
1497-1511); stock examples are RowCountEndpoint and BulkDeleteEndpoint
(hbase-examples/.../coprocessor/example/RowCountEndpoint.java,
BulkDeleteEndpoint.java). SURVEY §2.11 maps the surface to
``mapInPandas``/``applyInPandas`` over partitions.

Spark shape: a "service" is a function over Arrow-batched pandas frames
(the per-region computation); the partial results are ordinary rows the
caller reduces with a normal aggregation (the client-side merge). The
scan scoping (start/stop row, filter) reuses ``Table.scan``, so services
compose with the whole filter algebra and the index planner — same as
the reference, where the endpoint opens a scanner with the request's
Scan. Everything stays distributed: no collect, no driver loop.
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def coprocessor_service(
    table,
    fn: Callable,
    schema: str,
    scan=None,
) -> DataFrame:
    """Fan a per-partition service over the (optionally scan-scoped)
    table — the ``HTable.coprocessorService(..., callable)`` analog.

    ``fn(iterator_of_pandas_frames) -> iterator_of_pandas_frames`` runs
    once per partition (the per-region call); its output rows are the
    partial results, returned as one DataFrame for the caller to merge
    (e.g. ``.agg(F.sum(...))`` — the Batch.Callback accumulation).
    """
    df = table.scan(scan) if scan is not None else table.df
    return df.mapInPandas(fn, schema=schema)


def row_count_endpoint(table, scan=None) -> int:
    """RowCountEndpoint.java analog: per-partition row counts merged at
    the client. (With Spark this is semantically ``df.count()`` — the
    endpoint form exists to demonstrate the service surface and returns
    the identical number.)"""
    import pandas as pd

    def service(batches: Iterator) -> Iterator:
        n = 0
        for pdf in batches:
            n += len(pdf)
        yield pd.DataFrame({"partial_count": [n]})

    partials = coprocessor_service(table, service, "partial_count long", scan)
    row = partials.agg(F.sum("partial_count").alias("n")).collect()[0]
    return int(row["n"] or 0)


def bulk_delete_endpoint(table, scan=None, predicate=None):
    """BulkDeleteEndpoint.java analog: delete every row matched by a
    scan (and/or a predicate Column) in one distributed batch; returns
    ``(new_table, n_deleted)`` — the endpoint's RowsDeleted response.

    The reference endpoint scans and issues region-local deletes; here
    the matched rowkeys feed the ordinary ``Table.delete`` batch, so
    index maintenance happens in the same job, exactly like every other
    mutation path."""
    matched = table.scan(scan) if scan is not None else table.df
    if predicate is not None:
        matched = matched.filter(predicate)
    # materialize the matched keys once (localCheckpoint): both the
    # count and the delete's anti-join (plus every index-maintenance
    # join) would otherwise re-run the scan+filter pipeline
    keys = matched.select(table.rowkey_col).distinct().localCheckpoint(eager=True)
    n = keys.count()
    return table.delete(keys), n
