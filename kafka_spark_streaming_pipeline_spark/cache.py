"""Tracked persist: every operator-internal ``persist()`` goes through
``tracked_persist`` so a long-lived Engine session can reclaim executor
memory with one call instead of leaking cached partitions across calls
(the multi-consumer frames are tiny — grids, signatures, narrow hashed
columns — but a service calling operators in a loop would still
accumulate them without an unpersist path).

The registry holds STRONG references on purpose: the Python wrapper of
an operator-internal frame goes out of scope the moment the operator
returns, while the JVM-side InMemoryRelation lives on in the returned
plan — a weak registry would forget exactly the frames that leak.  The
wrappers are a few hundred bytes each; ``unpersist_tracked`` drops
both the cache blocks and the references."""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """``df.persist()`` + registration for later bulk release."""
    df.persist()
    _TRACKED.append(df)
    return df


def unpersist_tracked(blocking: bool = False) -> int:
    """Unpersist every tracked frame; returns how many were released.
    Safe to call at any time — an unpersisted frame simply recomputes
    on next use."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist(blocking)
            n += 1
        except Exception:
            pass
    return n


def mark() -> int:
    """Registry position, for scoped release: pair with
    ``tracked_since`` to capture exactly the frames an operator call
    persisted."""
    return len(_TRACKED)


def tracked_since(position: int) -> list[DataFrame]:
    """The frames registered after ``mark()`` returned ``position``."""
    return list(_TRACKED[position:])


def release(frames: list[DataFrame], blocking: bool = False) -> int:
    """Unpersist SPECIFIC frames and drop them from the registry — the
    scoped counterpart of ``unpersist_tracked`` for long-running read
    paths (e.g. a monitoring loop re-reading ``seasonal_view``) that
    must not clear caches other operators still hold."""
    n = 0
    for df in frames:
        try:
            df.unpersist(blocking)
            n += 1
        except Exception:
            pass
        try:
            _TRACKED.remove(df)
        except ValueError:
            pass
    return n
