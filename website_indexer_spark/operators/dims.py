"""Materialized dimension tables with MERGE (append-new-keys-only)
semantics — the persistent form of A17.

The reference maintains global unique ``Component``/``Link`` dimension
rows with ``bulk_create(ignore_conflicts=True)`` — an idempotent
insert-if-absent upsert (/root/reference/crawler/writer.py:22-43,
crawler/models.py:84-105). Here the same contract is expressed as an
anti-join delta: the incoming batch's distinct keys that are not yet
in the dimension become this superstep's append-only delta; keys
already present are untouched, so replaying a superstep (crash →
resume) re-derives the identical delta. On Iceberg this is exactly
``MERGE INTO dim USING delta ON key WHEN NOT MATCHED THEN INSERT``.

Scale: the dimension (every key ever seen — for ``links`` that is
10^9+ rows at design scale) is the big side and is never shuffled:
the wave's distinct incoming keys broadcast through the same
LeftSemi → LeftAnti composition as the URL-seen set
(operators/frontier.py ``exclude_keys``), so the dimension scan
streams map-side with zero exchanges. The only shuffle is the
``distinct`` over the wave's own exploded keys — bounded by the wave.
"""

from __future__ import annotations

from typing import List, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dim_upsert_delta(
    existing: DataFrame,
    incoming: DataFrame,
    key_cols: Union[str, List[str]],
    broadcast_incoming: bool = True,
    small_existing: bool = False,
) -> DataFrame:
    """Keys of ``incoming`` that are not yet in ``existing``: the rows
    a MERGE would insert. Output is distinct, non-null ``key_cols``.
    Composite keys are supported so several dimensions can share one
    physical table (e.g. the crawl store's ``(kind, key)`` dims table
    — one upsert job per superstep instead of one per dimension).

    Three physical strategies, picked by the caller's (free) size
    knowledge — for the crawl store, the manifest counters:

    * small_existing=True: the whole dimension broadcasts into ONE
      LeftAnti(BuildRight) — fewest jobs; right while the dimension
      fits a broadcast (the component dim forever, the link dim early).
    * broadcast_incoming=True (default): the huge dimension streams
      map-side unshuffled through LeftSemi(BuildRight) hits →
      LeftAnti(BuildRight) — the URL-seen-set composition
      (operators/frontier.py exclude_keys); right once the dimension
      outgrows broadcast but the wave's keys don't.
    * both False: plain shuffled anti-join — storage-partitioned on a
      key-bucketed dimension table at deployment scale.
    """
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    inc = incoming.select(*key_cols).na.drop(subset=key_cols).distinct()
    ex = existing.select(*key_cols)
    if small_existing:
        return inc.join(F.broadcast(ex), key_cols, "left_anti")
    if broadcast_incoming:
        hits = ex.join(F.broadcast(inc), key_cols, "left_semi")
        return inc.join(F.broadcast(hits), key_cols, "left_anti")
    return inc.join(ex, key_cols, "left_anti")
