"""Tracked persists: session-scoped registry of in-query ``persist()``
calls so long-lived sessions can release them.

Operators persist reused intermediates inside registered query plans
(diamond dependencies — guide §5). Those frames are referenced by the
RETURNED lazy DataFrame, so there is no in-operator point where an
unpersist is safe: the consumer may act on the plan any number of
times. Left untracked, every evaluation re-registers cached blocks
that live until session end (storage blocks are never LRU-reclaimed
to zero), which accumulates across queries in a long session.

``persist_tracked(df)`` is a drop-in replacement for ``df.persist()``
that records the frame per session; ``release_persists(spark)``
unpersists everything recorded for that session — correctness is
unaffected (a later action simply recomputes and re-caches). Harness
release points: bench.py / bench_compare.py clear between timed
queries; api consumers can call ``release_persists`` between requests.
The registry keeps strong refs to at most ``_MAX_SESSIONS`` sessions
(mirrors registry._plan_cache's bound).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_MAX_SESSIONS = 4
_tracked: dict[int, tuple[SparkSession, list[DataFrame]]] = {}


def persist_tracked(df: DataFrame) -> DataFrame:
    """persist() + register the frame for later release_persists()."""
    spark = df.sparkSession
    sid = id(spark)
    entry = _tracked.get(sid)
    if entry is None or entry[0] is not spark:
        while len(_tracked) >= _MAX_SESSIONS:
            _tracked.pop(next(iter(_tracked)))
        entry = _tracked[sid] = (spark, [])
    entry[1].append(df.persist())
    return df


def release_persists(spark: SparkSession) -> int:
    """Unpersist every frame tracked for ``spark``; returns how many.
    Safe at any time — subsequent actions recompute and re-cache."""
    entry = _tracked.pop(id(spark), None)
    if entry is None or entry[0] is not spark:
        return 0
    n = 0
    for df in entry[1]:
        try:
            df.unpersist()
            n += 1
        except Exception:  # session already stopped — nothing to free
            pass
    return n
