"""Bounded partial top-k reduction — the scale path for kNN ranking.

A bare ``row_number() OVER (PARTITION BY qid ORDER BY d)`` window
shuffles and SORTS the *entire* candidate set: at 200k docs the
grid-disk self-join emits ~240M rows, and in local mode that sort held
~23 GB of UnsafeExternalSorter pages in one JVM (BENCH/BASELINE.md
round-3 postmortem). The fix prescribed there (and in the round-3
verdict): a partial per-partition top-k reduction BEFORE the global
window, so the full candidate set never sits in any single sorter.

``partial_topk`` runs as ``mapInPandas`` directly on the join output —
no shuffle, no global sort. Each task streams its Arrow batches through
a bounded buffer: every batch is reduced to its k-smallest rows per
key, appended, and the buffer is re-compacted whenever it exceeds
``compact_rows``. Peak state per task is O(k x distinct keys in the
partition) + one batch — independent of the candidate count.

Exactness: keeping the k smallest rows per (key, input-partition) under
a TOTAL order (the caller must include a unique tiebreaker in
``order``) retains a superset of the global top-k per key, so the
downstream window — ordered by the same columns — returns exactly what
it would have returned over the full candidate set. With candidates
hash-partitioned by grid cell and a ring-1 disk, the reduced set is at
most ``k x 9`` rows per query key.

This is deliberately an Arrow-batched pandas stage rather than a
Catalyst window: Spark has no bounded-buffer top-k aggregate
(collect_list partials are unbounded, windows sort), and the pandas
reduction is vectorized per batch — O(batch log batch) sorts of 10k-row
batches, never a sort of the partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def partial_topk(
    df: DataFrame,
    keys: list[str],
    order: list[str],
    k: int,
    compact_rows: int = 1 << 20,
) -> DataFrame:
    """Per input partition, keep the ``k`` smallest rows per ``keys``
    group under lexicographic ascending ``order`` (which MUST be a
    total order — include a unique tiebreaker). Schema-preserving; adds
    no shuffle (narrow mapInPandas)."""
    sort_cols = list(keys) + list(order)

    def reduce(batches):
        import pandas as pd

        def compact(frames: list) -> "pd.DataFrame":
            allf = frames[0] if len(frames) == 1 else pd.concat(frames, ignore_index=True)
            allf = allf.sort_values(sort_cols, kind="mergesort", ignore_index=True)
            return allf.groupby(keys, sort=False).head(k)

        buf: list = []
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            b = compact([pdf])
            buf.append(b)
            n += len(b)
            if n >= compact_rows:
                b = compact(buf)
                buf, n = [b], len(b)
        if buf:
            yield compact(buf)

    return df.mapInPandas(reduce, schema=df.schema)
