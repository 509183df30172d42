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
    entries; round-10 rotation (VERDICT r9 #1) puts the 12 round-10
    additions and the 10 round-9 additions that have never had a hard
    driver row at the front, then the 10 r06-era queries deferred
    from the r9 window, then 18 of the 50 queries whose last driver
    row is r07.  Pin the window membership so a later edit appending
    to the wrong dict cannot silently rotate them out, and pin that
    the window is exactly the declared list."""
    names = list(entrymod.queries())
    window = names[:50]
    assert window == list(entrymod._R10_WINDOW), (
        "driver window drifted from _R10_WINDOW"
    )
    must_lead = {
        # round-10 additions
        "auto_fold_lifecycle", "bpe_production_merges",
        "stream_bm25_ingest", "gopher_quality", "perplexity_buckets",
        "edit_distance_near_dup", "hard_negatives", "temperature_mix",
        "c4_quality", "dedup_lines_docs", "clean_corpus_e2e",
        "stream_gopher_gate",
        # never driver-checked before r10: the 10 round-9 additions
        "fold_incremental_dedup", "fold_substring_flags",
        "bm25_index_fold", "langid_ngram_separation", "bpe_merges",
        "bpe_token_counts", "bpe_fertility", "leakage_safe_split",
        "ngram_novelty", "stream_quality_gate",
        # the 10 r06-era queries deferred from the r9 window
        "doc_repetition", "pii_redact",
        "embedding_near_dup_multiband", "unigram_logprob",
        "ann_ivf_kmeans", "ann_ivf_kmeans_indexed",
        "stream_enrich_events", "stream_keyed_windows",
        "cms_heavy_users", "bloom_filter_parts",
        # r07-era representatives across the families
        "dedup_exact_docs", "minhash_pairs", "salted_join_revenue",
        "stream_stream_join", "pipeline_template_e2e",
        "semantic_dedup",
    }
    missing = must_lead - set(window)
    assert not missing, f"never-checked leaders fell out of the first 50: {missing}"
    # the full registry is unchanged by the reorder
    assert len(names) == len(set(names)) == len(entrymod._all_queries())
    # no registered query's last hard driver row may age past two
    # rounds once this window lands: everything outside it was checked
    # in r08 or r09 (see CORRECTNESS_r0*.json), and the r07 leftovers
    # deferred to r11 are named in the _R10_WINDOW comment.
    assert len(window) == 50
