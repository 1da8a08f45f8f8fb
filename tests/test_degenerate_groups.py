"""Degenerate-group parity: singleton / zero-variance groups and empty docs.

The round-5 advice found a latent engine-divergence class in the
integer-moment rewrites: bare double x/0 is NaN/Infinity in Spark but NULL
in DuckDB, so a singleton group (n=1) or a zero-variance group would silently
diverge — masked because the driver fixtures contain no degenerate groups.
The fix (nullif-guarded denominators, aggregates.py agg_stats/agg_corr_covar)
and the empty-document guard in text_fingerprint (element_at([],1) throws
under ANSI; DuckDB list_reduce([]) errors) are pinned here on purpose-built
degenerate fixtures that the sf* data will never contain.
"""

from __future__ import annotations

import duckdb
import pytest

from onebrc_spark import registry
from tests.compare import assert_match

ALL = registry.load_all()


@pytest.fixture(scope="module")
def degen_dir(spark, tmp_path_factory):
    """A tiny sf-dir whose events/lineitem/documents exercise every
    degenerate class: n=1 groups, zero-variance groups, constant-x groups,
    empty and all-whitespace documents."""
    d = tmp_path_factory.mktemp("degen_sf")
    events = spark.createDataFrame(
        [
            # singleton group: n=1 -> n*(n-1)=0 -> var/sd NULL
            (1, "2024-01-01 00:00:00", 1, "solo", 3.7, "{}"),
            # zero-variance group: all values equal -> var 0.0, sd 0.0 (not NULL)
            (2, "2024-01-01 00:00:01", 1, "flat", 2.0, "{}"),
            (3, "2024-01-01 00:00:02", 2, "flat", 2.0, "{}"),
            (4, "2024-01-01 00:00:03", 3, "flat", 2.0, "{}"),
            # normal group for contrast
            (5, "2024-01-01 00:00:04", 1, "mix", 1.0, "{}"),
            (6, "2024-01-01 00:00:05", 2, "mix", 2.5, "{}"),
            (7, "2024-01-01 00:00:06", 3, "mix", -4.0, "{}"),
        ],
        "event_id LONG, ts STRING, user_id LONG, event_type STRING, "
        "value DOUBLE, props STRING",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id", "event_type",
        "value", "props"
    )
    lineitem = spark.createDataFrame(
        [
            # singleton group: corr/covar_samp/slope all NULL
            (1, 1, 1, 1, 5.0, 100.0, 0.05, 0.02, "S", "O", "2024-01-01 00:00:00"),
            # constant-x group: varx=0 -> corr NULL, slope NULL; covar defined
            (2, 1, 1, 1, 3.0, 100.0, 0.01, 0.03, "C", "O", "2024-01-01 00:00:00"),
            (3, 1, 1, 2, 3.0, 250.0, 0.02, 0.04, "C", "F", "2024-01-01 00:00:00"),
            (4, 1, 1, 3, 3.0, 400.0, 0.00, 0.05, "C", "F", "2024-01-01 00:00:00"),
            # normal group
            (5, 1, 1, 1, 1.0, 120.0, 0.01, 0.01, "N", "O", "2024-01-01 00:00:00"),
            (6, 1, 1, 2, 2.0, 260.0, 0.03, 0.06, "N", "F", "2024-01-01 00:00:00"),
            (7, 1, 1, 3, 9.0, 980.0, 0.08, 0.00, "N", "O", "2024-01-01 00:00:00"),
        ],
        "l_orderkey LONG, l_partkey LONG, l_suppkey LONG, l_linenumber INT, "
        "l_quantity DOUBLE, l_extendedprice DOUBLE, l_discount DOUBLE, "
        "l_tax DOUBLE, l_returnflag STRING, l_linestatus STRING, "
        "l_shipdate STRING",
    ).selectExpr(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "CAST(l_shipdate AS TIMESTAMP) AS l_shipdate"
    )
    documents = spark.createDataFrame(
        [
            (1, "", "en", "web", 0),             # empty -> NULL fingerprint
            (2, "   ", "en", "web", 3),          # all-whitespace -> NULL
            (3, "hello  world", "en", "web", 12),  # double space: empty token
            (4, "one", "en", "web", 3),          # single token: empty fold tail
        ],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )
    for name, df in (("events", events), ("lineitem", lineitem),
                     ("documents", documents)):
        df.coalesce(1).write.mode("overwrite").parquet(str(d / f"{name}.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def degen_duck(degen_dir):
    con = duckdb.connect()
    for name in ("events", "lineitem", "documents"):
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"'{degen_dir}/{name}.parquet/*.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize(
    "name", ["agg_stats", "agg_corr_covar", "text_fingerprint"]
)
def test_degenerate_groups_match_oracle(spark, degen_dir, degen_duck, name):
    q = ALL[name]
    sdf = q.fn(spark, degen_dir)
    rel = degen_duck.sql(q.oracle)
    assert_match(sdf, rel, name=f"{name}[degenerate]")


def test_singleton_group_yields_null_not_nan(spark, degen_dir):
    """The guard must produce NULL (the built-ins' semantics), never NaN/Inf."""
    rows = {
        r["event_type"]: r
        for r in ALL["agg_stats"].fn(spark, degen_dir).collect()
    }
    assert rows["solo"]["sd_value"] is None
    assert rows["solo"]["var_value"] is None
    assert rows["flat"]["var_value"] == 0.0
    corr = {
        r["l_returnflag"]: r
        for r in ALL["agg_corr_covar"].fn(spark, degen_dir).collect()
    }
    assert corr["S"]["corr_qty_price"] is None        # n=1
    assert corr["S"]["covar_qty_price"] is None       # n*(n-1)=0
    assert corr["C"]["corr_qty_price"] is None        # varx=0
    assert corr["C"]["slope_price_on_qty"] is None    # varx=0
    assert corr["N"]["corr_qty_price"] is not None
    fp = {
        r["doc_id"]: r["fingerprint"]
        for r in ALL["text_fingerprint"].fn(spark, degen_dir).collect()
    }
    assert fp[1] is None and fp[2] is None
    assert fp[3] is not None and fp[4] is not None
