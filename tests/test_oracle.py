"""Self-check of the driver contract: every oracle_sql() entry is run
through DuckDB and compared with the matching queries() DataFrame at
sf0.001 — row count, column names, and (order-insensitively) values.
This mirrors the driver's CORRECTNESS gate so mismatches surface here
first.  Rows-only queries are executed for stability (non-empty or
deterministic row count) but not value-compared.
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"

_ORACLES = entrymod.oracle_sql()
_QUERIES = entrymod.queries()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in entrymod._TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if v is None:
                vals.append(None)
            elif isinstance(v, bool):
                vals.append(v)
            elif isinstance(v, float):
                if math.isnan(v):
                    vals.append("nan")
                else:
                    vals.append(round(v, 9))
            elif isinstance(v, int):
                vals.append(int(v))
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def test_all_queries_have_known_shape():
    assert set(_ORACLES) <= set(_QUERIES), "oracle without a query"
    rows_only = set(_QUERIES) - set(_ORACLES)
    # every rows-only query documents why in its docstring
    for name in rows_only:
        fn = _QUERIES[name]
        doc = (fn.__doc__ or "") + (getattr(fn, "__wrapped__", fn).__doc__ or "")
        assert "rows-only" in doc, f"{name} lacks oracle and rows-only justification"


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_query_matches_oracle(spark, duck, name):
    sdf = _QUERIES[name](spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.sql(_ORACLES[name])
    duck_cols = res.columns
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column names differ"
    assert len(spark_rows) == len(duck_rows), f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"

    ns, nd = normalize(spark_rows, spark_cols), normalize(duck_rows, duck_cols)
    mismatches = [(a, b) for a, b in zip(ns, nd) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = _QUERIES[name](spark, SF_DIR)
    n = df.count()
    assert n >= 0
    # determinism: run twice, same count
    assert _QUERIES[name](spark, SF_DIR).count() == n


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_driver_window_leads_with_never_checked_queries():
    """The external driver gate checks only the FIRST 50 queries()
    entries; round-11 rotation (VERDICT r10 #1a) puts the 5 round-11
    additions and ALL 32 r07-era deferrals (the queries whose last
    hard driver row is r07 — named in the r10 window comment) at the
    front, then the 13 stalest r08-era queries in registry order.
    Pin the window membership so a later edit appending to the wrong
    dict cannot silently rotate them out, and pin that the window is
    exactly the declared list."""
    names = list(entrymod.queries())
    window = names[:50]
    assert window == list(entrymod._R11_WINDOW), (
        "driver window drifted from _R11_WINDOW"
    )
    must_lead = {
        # round-11 additions (never driver-checked)
        "stream_ivf_ingest", "exact_ngram_dedup",
        "auto_exact_ngram_lifecycle", "token_budget_sample",
        "exact_ngram_clean",
        # all 32 r07-era deferrals — the rotation's whole purpose
        "weighted_sample", "pagerank_nations", "hll_union_entities",
        "dsir_sample", "stream_stream_left_join", "hll_users_by_type",
        "rollup_reaggregate", "oov_rate", "training_corpus_e2e",
        "triangle_count_nations", "stream_cms_users",
        "incremental_dedup", "embedding_outliers", "quantiles_by_type",
        "stream_pipeline_keyed_stateful", "min_cost_supplier",
        "large_orders", "order_priority_exists",
        "rich_inactive_customers", "q6_revenue_change",
        "q7_nation_volume", "q8_market_share", "q9_product_profit",
        "q10_returned_items", "q12_late_shipments", "q14_promo_share",
        "q15_top_supplier", "q16_part_supplier_counts",
        "zscore_outliers", "window_nav_funcs",
        "q13_customer_distribution", "q19_disjunctive_revenue",
        # r08-era representatives across the families
        "bm25_top_docs", "session_gap",
        "jsonnet_window_stats", "asof_join", "embedding_near_dup",
    }
    missing = must_lead - set(window)
    assert not missing, f"stale leaders fell out of the first 50: {missing}"
    # the full registry is unchanged by the reorder
    assert len(names) == len(set(names)) == len(entrymod._all_queries())
    # no registered query's last hard driver row may age past two
    # rounds once this window lands: everything outside it was checked
    # in r09 or r10 (see CORRECTNESS_r09/r10.json), and the r08
    # leftovers deferred to r12 are named in the _R11_WINDOW comment.
    assert len(window) == 50
