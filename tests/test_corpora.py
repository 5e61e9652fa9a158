"""Invariant pins for the GENERATED corpora (scripts/make_skewed.py,
scripts/make_scale.py) — DuckDB-only, no Spark session.

Round 12 found two corpus bugs the parity gates could not see because
both engines read the same (wrong) files: replicated facts with
unreplicated parents silently shrank joins to 1/rep scale, and
replicating orders onto unchanged custkeys manufactured exact
o_totalprice ties per customer, flipping engine-defined argmin/argmax
tie-breaking (agg_min_max_by is documented tie-free). These pins make
the generator contracts — FK integrity survives replication, skew
targets stay hot, no manufactured ties, text/vector perturbation keeps
replicas from becoming artificial near-duplicates — standing pytest
properties instead of one-round fixes.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts"))


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


@pytest.fixture(scope="module")
def skew_bench_dir() -> str:
    from make_skewed import ensure_skewed_bench

    return ensure_skewed_bench()


@pytest.fixture(scope="module")
def sf1_dir() -> str:
    from make_scale import ensure_sf1_bench

    return ensure_sf1_bench()


def _count(duck, sql: str) -> int:
    return duck.sql(sql).fetchone()[0]


def _pq(d: str, t: str) -> str:
    return f"read_parquet('{os.path.join(d, t + '.parquet')}')"


# --- skewed bench corpus ----------------------------------------------


def test_skew_bench_fk_integrity(duck, skew_bench_dir):
    d = skew_bench_dir
    assert _count(duck, f"""
        SELECT COUNT(*) FROM {_pq(d, 'lineitem')} l
        LEFT JOIN {_pq(d, 'orders')} o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderkey IS NULL""") == 0
    assert _count(duck, f"""
        SELECT COUNT(*) FROM {_pq(d, 'orders')} o
        LEFT JOIN {_pq(d, 'customer')} c ON o.o_custkey = c.c_custkey
        WHERE c.c_custkey IS NULL""") == 0


def test_skew_bench_no_manufactured_argmax_ties(duck, skew_bench_dir):
    # replication must not create exact o_totalprice duplicates within a
    # customer — agg_min_max_by's tie-free precondition
    assert _count(duck, f"""
        SELECT COUNT(*) FROM (
          SELECT o_custkey, o_totalprice FROM {_pq(skew_bench_dir, 'orders')}
          GROUP BY 1, 2 HAVING COUNT(*) > 1)""") == 0


def test_skew_bench_hot_keys_survive_replication(duck, skew_bench_dir):
    d = skew_bench_dir
    # the skew transforms' whole point: one user carries ~20% of events
    # and one supplier ~25% of lineitem, ACROSS replicas (un-offset)
    top_user = duck.sql(f"""
        SELECT COUNT(*) * 1.0 / (SELECT COUNT(*) FROM {_pq(d, 'events')})
        FROM {_pq(d, 'events')} GROUP BY user_id
        ORDER BY 1 DESC LIMIT 1""").fetchone()[0]
    assert top_user > 0.15, f"hot user diluted to {top_user:.3f}"
    top_supp = duck.sql(f"""
        SELECT COUNT(*) * 1.0 / (SELECT COUNT(*) FROM {_pq(d, 'lineitem')})
        FROM {_pq(d, 'lineitem')} GROUP BY l_suppkey
        ORDER BY 1 DESC LIMIT 1""").fetchone()[0]
    assert top_supp > 0.20, f"hot supplier diluted to {top_supp:.3f}"


def test_skew_bench_doc_embedding_coverage_matches_source(duck, skew_bench_dir):
    # documents-embeddings (doc_id = vec_id) coverage ratio must survive
    # replication — the r11 advisor's 1/rep silent-shrink finding
    src = "/root/testdata/sf0.1"
    for d, name in ((src, "src"), (skew_bench_dir, "bench")):
        n_doc = _count(duck, f"SELECT COUNT(*) FROM {_pq(d, 'documents')}")
        n_cov = _count(duck, f"""
            SELECT COUNT(*) FROM {_pq(d, 'documents')} x
            JOIN {_pq(d, 'embeddings')} e ON x.doc_id = e.vec_id""")
        if name == "src":
            want = n_cov / n_doc
        else:
            assert abs(n_cov / n_doc - want) < 1e-9


# --- sf1-equivalent scaling corpus ------------------------------------


def test_sf1_bench_fk_integrity(duck, sf1_dir):
    d = sf1_dir
    for fact, fk, dim, pk in (
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
    ):
        n = _count(duck, f"""
            SELECT COUNT(*) FROM {_pq(d, fact)} f
            LEFT JOIN {_pq(d, dim)} x ON f.{fk} = x.{pk}
            WHERE x.{pk} IS NULL AND f.{fk} IS NOT NULL""")
        assert n == 0, f"{fact}.{fk} -> {dim}.{pk}: {n} dangling"


def test_sf1_bench_replicas_are_not_near_duplicates(duck, sf1_dir):
    # character rotation must keep replica texts distinct (same doc_id
    # mod the offset constant = same source row): identical replicas
    # would 100x the LSH candidate-pair count and fake a quadratic
    n_texts, n_rows = duck.sql(
        f"SELECT COUNT(DISTINCT text), COUNT(*) FROM {_pq(sf1_dir, 'documents')}"
    ).fetchone()
    src_texts, src_rows = duck.sql(
        "SELECT COUNT(DISTINCT text), COUNT(*) FROM "
        "read_parquet('/root/testdata/sf0.1/documents.parquet')"
    ).fetchone()
    # every source-distinct text stays distinct in every replica
    assert n_texts == src_texts * (n_rows // src_rows)
    # ...and the rotation preserves length: the text-length histogram of
    # the scaled corpus is exactly REP x the source histogram
    drift = _count(duck, f"""
        WITH b AS (SELECT len(text) AS l, COUNT(*) AS c
                   FROM {_pq(sf1_dir, 'documents')} GROUP BY 1),
             s AS (SELECT len(text) AS l, COUNT(*) * {n_rows // src_rows} AS c
                   FROM read_parquet('/root/testdata/sf0.1/documents.parquet')
                   GROUP BY 1)
        SELECT COUNT(*) FROM b FULL JOIN s USING (l)
        WHERE b.c IS DISTINCT FROM s.c""")
    assert drift == 0


def test_sf1_bench_embedding_rotation_preserves_shape(duck, sf1_dir):
    lo, hi = duck.sql(
        f"SELECT MIN(len(embedding)), MAX(len(embedding)) FROM {_pq(sf1_dir, 'embeddings')}"
    ).fetchone()
    assert lo == hi == 64
