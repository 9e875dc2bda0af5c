"""Session-scoped registry for AD-HOC persisted frames.

Several queries persist an intermediate for the duration of their own
plan (MinHash's shingle projection, SimHash's signature frame, the
curation funnel's survivor frames, the phash signature frame): the
persist pays off because the frame is consumed by two or more subtrees
of ONE action, but the frame cannot be unpersisted inside the lazy plan
it backs — so before round 5 each call simply leaked its persisted
blocks into executor storage (review r5).  This registry tracks them
per session so ``release_session_caches`` (and bench.py's between-
family release) can drop them in bulk; Spark's LRU storage eviction
bounds the damage in between.

Honesty note on lifetime (applies equally to the named per-session
memo caches in text_dedup/similarity/graph_bridge): a cached DataFrame
strongly references its SparkSession, so NO keying scheme — weak or
otherwise — can make entries vanish automatically when the session is
dropped; the value itself keeps the session alive.  Explicit release is
the real mechanism, which is why ``release_session_caches`` exists and
is part of the bench/serve loop.  Keys here are ``id(session)``: cheap,
and an id can only be recycled after the session object is freed, which
the strong value reference prevents while an entry exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_TRACKED: dict[int, list[DataFrame]] = {}


def persist_tracked(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for bulk release."""
    df = df.persist()
    _TRACKED.setdefault(id(spark), []).append(df)
    return df


def release_tracked(spark: SparkSession) -> int:
    """Unpersist every tracked frame of this session; returns count."""
    dropped = _TRACKED.pop(id(spark), [])
    for df in dropped:
        try:
            df.unpersist(False)
        except Exception:  # session already stopped: JVM cache is gone
            pass
    return len(dropped)
