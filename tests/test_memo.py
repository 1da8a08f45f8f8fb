"""PersistedLRU: the bounded memo behind the pair-set / component-label
caches (VERDICT r6 #7). Pins the one property that matters: a session that
walks more sf_dirs than `maxsize` unpersists the evicted DataFrames, so
executor storage is O(maxsize), never O(#directories)."""

from __future__ import annotations

from pyspark import StorageLevel

from onebrc_spark.operators.memo import PersistedLRU


def _persisted(df) -> bool:
    return df.storageLevel != StorageLevel.NONE


def test_lru_evicts_and_unpersists_on_capacity(spark):
    lru = PersistedLRU(maxsize=2)
    a = spark.range(3).persist()
    b = spark.range(4).persist()
    c = spark.range(5).persist()
    for df in (a, b, c):
        df.count()  # materialize the persist
    lru.put("a", a)
    lru.put("b", b)
    assert _persisted(a) and _persisted(b)
    lru.put("c", c)  # third key: evicts LRU entry "a" and unpersists it
    assert not _persisted(a), "evicted entry must be unpersisted"
    assert _persisted(b) and _persisted(c)
    assert lru.get("a") is None
    assert lru.get("b") is b and lru.get("c") is c
    lru.clear()
    assert not _persisted(b) and not _persisted(c)
    assert len(lru) == 0


def test_lru_recency_order_protects_hot_entry(spark):
    lru = PersistedLRU(maxsize=2)
    a = spark.range(3).persist()
    b = spark.range(4).persist()
    c = spark.range(5).persist()
    for df in (a, b, c):
        df.count()
    lru.put("a", a)
    lru.put("b", b)
    lru.get("a")  # touch: "b" becomes LRU
    lru.put("c", c)
    assert _persisted(a), "recently-read entry must survive eviction"
    assert not _persisted(b), "least-recently-used entry must be evicted"
    lru.clear()


def test_operator_caches_are_bounded():
    """The two production memos carry the documented 2-entry bound (the
    bench warmup + measured directories — see memo.py's module docstring)."""
    from onebrc_spark.operators.clustering import _COMPONENTS_CACHE
    from onebrc_spark.operators.dedup import _MINHASH_PAIRS_CACHE

    assert isinstance(_MINHASH_PAIRS_CACHE, PersistedLRU)
    assert isinstance(_COMPONENTS_CACHE, PersistedLRU)
    assert _MINHASH_PAIRS_CACHE._maxsize == 2
    assert _COMPONENTS_CACHE._maxsize == 2
