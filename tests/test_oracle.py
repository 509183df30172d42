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
    entries; round-13 rotation (VERDICT r12 #1) puts the 4 round-13
    additions and ALL 40 r09-era deferrals (the queries whose last
    hard driver row is r09 — recomputed from CORRECTNESS_r01..r12;
    the r12 window comment's 40 was right, this file's old 39 was the
    off-by-one ADVICE r12 flagged) at the front, then the 6 stalest
    r10-era queries in registry order.  Pin the window membership so
    a later edit appending to the wrong dict cannot silently rotate
    them out, and pin that the window is exactly the declared list."""
    names = list(entrymod.queries())
    window = names[:50]
    assert window == list(entrymod._R13_WINDOW), (
        "driver window drifted from _R13_WINDOW"
    )
    must_lead = {
        # round-13 additions (never driver-checked)
        "near_dup_multiband_capped", "ann_recall_eval", "shard_shuffle",
        "ivf_refit_recall",
        # all 40 r09-era deferrals — the rotation's whole purpose
        "ngram_jaccard_pairs", "embedding_cosine_pairs", "simhash_docs",
        "ann_lsh", "ann_lsh_indexed", "grouping_sets", "sort_limit",
        "scalar_functions", "pivot_conditional", "topk_frequent",
        "avg_subquery_join", "ann_pq", "ann_ivf_pq",
        "ann_ivf_pq_indexed", "ivf_counts", "ann_ivf",
        "decontaminate_docs", "pack_documents", "vocabulary",
        "boilerplate_spans", "chunk_tokens", "bm25_multi_query",
        "exact_substring_pairs", "exact_substring_dedup",
        "stream_near_dup", "stream_incremental_dedup",
        "stream_substring_flags", "ann_ivf_incremental",
        "bm25_passages", "pmi_collocations", "bigram_logprob",
        "hll_overlap_segments", "langid_ngram_confusion", "agg_rollup",
        "agg_cube", "topk_per_group", "set_ops", "percentiles",
        "regexp_extract_parts", "join_full_outer",
    }
    missing = must_lead - set(window)
    assert not missing, f"stale leaders fell out of the first 50: {missing}"
    # the full registry is unchanged by the reorder
    assert len(names) == len(set(names)) == len(entrymod._all_queries())
    # no registered query's last hard driver row may age past three
    # rounds once this window lands: everything outside it was checked
    # in r10, r11, or r12 (CORRECTNESS_r10/r11/r12.json); the 44
    # r10-era leftovers (registry order from pii_redact on) lead the
    # r14 window (see the _R13_WINDOW comment).
    assert len(window) == 50
