"""Tracked persistence for operator intermediates.

Several operators (MinHash-LSH dedup, SimHash, n-gram Jaccard) materialize an
intermediate table with ``persist()`` — either because the plan references it
multiple times (the shingle table feeds both the signature build and both
sides of the Jaccard verify) or because leaving the expensive higher-order
shingle expression unmaterialized lets it fuse into a downstream Generate
stage and re-evaluate pathologically (measured at sf0.01: the same 32-vote
SimHash aggregation costs ~50 s against the lazy pipeline vs ~1.4 s against a
persisted shingle table; a shuffle barrier via ``repartition`` does NOT help —
the re-evaluation happens downstream of the exchange, so only materialization
fixes it).

The catch: an operator returns a *lazy* DataFrame, so it cannot unpersist its
intermediates before the caller materializes the result — yet a long-lived
session running many queries (the correctness driver runs 50 in one go) must
not accumulate cached tables. This module is the middle ground: operators
persist through :func:`persist_tracked`, and session owners (bench harness,
correctness driver, service jobs) call :func:`release_caches` between queries.

At 100 TB the same pattern holds — the "persist" becomes a checkpoint to the
cluster store and the release is the job teardown; the registry is how the
engine keeps that lifecycle explicit instead of leaking it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def persist_tracked(df: DataFrame, eager: bool = False) -> DataFrame:
    """Persist ``df`` and register it for later :func:`release_caches`.

    ``eager=True`` forces materialization now (a ``count()``), so downstream
    plans are built against a known cached table instead of estimates and no
    upstream expression can fuse past the cache boundary.
    """
    df = df.persist()
    _LIVE.append(df)
    if eager:
        df.count()
    return df


def release_caches() -> int:
    """Unpersist every tracked DataFrame (LIFO); returns how many were freed.

    Safe to call at any time — untracked caches (user-level ``persist`` calls)
    are untouched, and releasing is idempotent.
    """
    n = 0
    while _LIVE:
        df = _LIVE.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # session already stopped — nothing to free
            pass
    return n
