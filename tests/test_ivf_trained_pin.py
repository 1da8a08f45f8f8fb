"""Exactness pin for the DEREGISTERED full-corpus IVF fit (VERDICT r8 #2).

sim_ann_ivf_trained — 3 full-corpus Lloyd passes feeding probe-2 retrieval —
was the registry's fullsweep outlier (8.6 s at sf0.01) while its 100 TB role
is covered by sim_ann_ivf_sampled. It is no longer a registered query; this
module keeps the full-fit ↔ unrolled-SQL-replay equivalence proven by
EXECUTION on small fixtures: the same driver-strict comparison the registry
parity suite applies, against the same _ivf_trained_sql() oracle (with the
registration-time non-finite normalization applied manually, since the
@query decorator no longer does it).

Two fixtures: the sf0.001 corpus (the smoke SF), and an adversarial
embedding set with zero-norm / duplicate / antipodal / NaN / Inf vectors —
the classes the edge-embeddings suite covered while the query was
registered.
"""

from __future__ import annotations

import duckdb
import pytest

from onebrc_spark.operators.similarity import _ivf_trained_sql, sim_ann_ivf_trained
from onebrc_spark.registry import _normalize_events_refs
from tests.compare import assert_match
from tests.conftest import SMOKE_SF_DIR

ORACLE = _normalize_events_refs(_ivf_trained_sql(), "sim_ann_ivf_trained[pin]")


def test_ivf_trained_matches_unrolled_fit_replay_smoke(spark):
    con = duckdb.connect()
    try:
        con.sql(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"'{SMOKE_SF_DIR}/embeddings.parquet'"
        )
        sdf = sim_ann_ivf_trained(spark, SMOKE_SF_DIR)
        assert_match(sdf, con.sql(ORACLE), name="sim_ann_ivf_trained[pin]")
    finally:
        con.close()


def _edge_vec(i: int) -> list[float]:
    return [((i * 31 + d * 17) % 13 - 6) / 7.0 for d in range(64)]


@pytest.fixture(scope="module")
def edge_emb_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("ivf_pin_emb")
    rows = [(0, [0.0] * 64, 1), (1, [1e-30] * 64, 1)]
    rows.append((2, _edge_vec(2), 2))
    rows.append((3, _edge_vec(2), 2))  # exact duplicate
    rows.append((4, [-v for v in _edge_vec(2)], 2))  # antipode
    rows += [(i, _edge_vec(i), i % 10) for i in range(5, 24)]
    nan_vec = _edge_vec(24)
    nan_vec[7] = float("nan")
    rows.append((24, nan_vec, 3))
    inf_vec = _edge_vec(25)
    inf_vec[0] = float("inf")
    rows.append((25, inf_vec, 4))
    emb = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>, label INT")
    emb.coalesce(1).write.mode("overwrite").parquet(str(d / "embeddings.parquet"))
    return str(d)


def test_ivf_trained_matches_unrolled_fit_replay_edge_vectors(spark, edge_emb_dir):
    con = duckdb.connect()
    try:
        con.sql(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"'{edge_emb_dir}/embeddings.parquet/*.parquet'"
        )
        sdf = sim_ann_ivf_trained(spark, edge_emb_dir)
        assert_match(sdf, con.sql(ORACLE), name="sim_ann_ivf_trained[pin-edge]")
    finally:
        con.close()
