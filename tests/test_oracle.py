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


def test_driver_window_leads_with_r04_stale_queries():
    """The external driver gate checks only the FIRST 50 queries()
    entries; round-6 rotation (VERDICT r5 #1) put the 38 queries whose
    only driver rows predate the r05 testdata regeneration at the
    front.  Pin the window membership so a later edit appending to the
    wrong dict cannot silently rotate them out."""
    names = list(entrymod.queries())
    window = set(names[:50])
    must_lead = {
        "dedup_exact_docs", "dup_clusters", "stratified_sample",
        "dataset_mix", "text_stats", "lang_id", "quality_score",
        "token_count_by_source", "fingerprint_docs", "ann_bruteforce",
        "minhash_pairs", "near_dup_verified", "ngram_jaccard_pairs",
        "embedding_cosine_pairs", "simhash_docs", "ann_lsh",
        "grouping_sets", "sort_limit", "scalar_functions",
        "pivot_conditional", "topk_frequent", "avg_subquery_join",
        "decontaminate_docs", "pack_documents", "vocabulary",
        "boilerplate_spans", "chunk_tokens", "doc_repetition",
        "pii_redact", "string_agg_sorted", "vector_dim_stats",
        "ann_lsh_indexed", "ann_ivf_indexed", "ann_pq", "ann_ivf_pq",
        "ann_ivf_pq_indexed", "ivf_counts", "ann_ivf",
    }
    missing = must_lead - window
    assert not missing, f"r04-stale leaders fell out of the first 50: {missing}"
