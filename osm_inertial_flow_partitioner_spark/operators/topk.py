"""Bounded partial top-k reduction — the scale path for kNN ranking.

A bare ``row_number() OVER (PARTITION BY qid ORDER BY d)`` window
shuffles and SORTS the *entire* candidate set: at 200k docs the
grid-disk self-join emits ~240M rows, and in local mode that sort held
~23 GB of UnsafeExternalSorter pages in one JVM (BENCH/BASELINE.md
round-3 postmortem). The fix prescribed there (and in the round-3
verdict): a partial per-partition top-k reduction BEFORE the global
window, so the full candidate set never sits in any single sorter.

``partial_topk`` runs as ``mapInArrow`` directly on the join output —
no shuffle, no global sort. Each task streams its Arrow batches through
a bounded buffer: every batch is reduced to its k-smallest rows per
key, appended, and the buffer is re-compacted whenever it exceeds
``compact_rows``. Peak state per task is O(k x distinct keys in the
partition) + one batch — independent of the candidate count.

Round-6 rewrite (guide §4.2): the reduction was a ``mapInPandas`` with
``DataFrame.sort_values`` + ``groupby().head`` — at 240M rows the
Arrow->pandas conversion and the per-batch pandas machinery dominated
the whole adjacency build (profiled: 1993 executor-seconds, the single
largest stage of a 200k-doc run). The same exact reduction is now one
``np.lexsort`` + run-length mask per batch over zero-copy Arrow column
buffers, and rows are materialized via ``RecordBatch.take`` — no
pandas anywhere, several-fold fewer cycles per row.

Exactness: keeping the k smallest rows per (key, input-partition) under
a TOTAL order (the caller must include a unique tiebreaker in
``order``) retains a superset of the global top-k per key, so the
downstream window — ordered by the same columns — returns exactly what
it would have returned over the full candidate set. With candidates
hash-partitioned by grid cell and a ring-1 disk, the reduced set is at
most ``k x 9`` rows per query key. (NaN ordering matches the previous
pandas implementation: np.lexsort, like sort_values, places NaN last.)
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
    no shuffle (narrow mapInArrow). Key and order columns must be
    numeric (the kNN contract); payload columns may be any type."""
    sort_cols = list(keys) + list(order)

    def reduce(batches):
        import numpy as np
        import pyarrow as pa

        def topk_indices(cols: list[np.ndarray]) -> np.ndarray:
            """Indices of the k smallest rows per key group under the
            (keys + order) lexicographic ascending total order."""
            # np.lexsort: LAST key is primary -> reverse sort_cols
            sorted_idx = np.lexsort(tuple(c for c in reversed(cols)))
            nk = len(keys)
            n = len(sorted_idx)
            if n == 0:
                return sorted_idx
            new_group = np.ones(n, dtype=bool)
            for ki in range(nk):
                kc = cols[ki][sorted_idx]
                ng = np.empty(n, dtype=bool)
                ng[0] = True
                ng[1:] = kc[1:] != kc[:-1]
                new_group = ng if ki == 0 else (new_group | ng)
            starts = np.flatnonzero(new_group)
            gidx = np.cumsum(new_group) - 1
            rank = np.arange(n, dtype=np.int64) - starts[gidx]
            return sorted_idx[rank < k]

        def compact(parts: list) -> "pa.Table":
            tbl = pa.Table.from_batches(parts).combine_chunks()
            cols = [
                tbl.column(c).to_numpy(zero_copy_only=False)
                for c in sort_cols
            ]
            idx = topk_indices(cols)
            return tbl.take(pa.array(idx, type=pa.int64()))

        buf: list = []
        n = 0
        schema = None
        for batch in batches:
            schema = batch.schema
            if batch.num_rows == 0:
                continue
            t = compact([batch])
            buf.extend(t.to_batches())
            n += t.num_rows
            if n >= compact_rows:
                t = compact(buf)
                buf, n = t.to_batches(), t.num_rows
        if buf:
            yield from compact(buf).to_batches()

    return df.mapInArrow(reduce, schema=df.schema)
