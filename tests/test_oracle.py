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


ROUND = 16  # the round whose window queries() currently declares


def test_driver_window_matches_script_emitted_plan():
    """The external driver gate checks only the FIRST 50 queries()
    entries.  From r14 on (VERDICT r13 #1/#2: two rounds of
    hand-written deferral counts were off by one) the window is
    EMITTED by scripts/window_plan.py — additions first (no hard
    driver row yet), then the stalest cohorts by last-hard-row round,
    registry order within each — and this guard pins the declared
    tuple, the live queries() ordering, and the script's plan to each
    other, so the three bookkeeping sites cannot disagree.

    VERDICT r14 #1: the guard passes the DECLARED round to plan(),
    which only counts hard rows from rounds BEFORE it — so the guard
    stays green at every phase of the round cycle, including after
    the driver writes this round's own CORRECTNESS artifact (the r14
    guard globbed everything and went red mid-round).  The cohort
    breakdown and the freshness invariant both DERIVE from the same
    plan() call instead of being hand-pasted (and hand-staled)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "window_plan",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts",
            "window_plan.py",
        ),
    )
    window_plan = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(window_plan)
    _, last, planned, breakdown = window_plan.plan(ROUND)

    names = list(entrymod.queries())
    window = names[:50]
    declared = getattr(entrymod, f"_R{ROUND}_WINDOW")
    assert window == list(declared), (
        f"driver window drifted from _R{ROUND}_WINDOW"
    )
    assert window == planned, (
        f"declared _R{ROUND}_WINDOW does not match "
        f"`python scripts/window_plan.py {ROUND}` — re-run the script "
        "and paste its tuple body (new queries lead as additions)"
    )
    # the breakdown is derived, not asserted literally: additions
    # lead, cohorts are taken stalest-first, and the counts sum to 50
    assert breakdown[0][0] == "additions", breakdown
    cohort_rounds = [
        int(kind[len("last hard row r"):]) for kind, _ in breakdown[1:]
    ]
    assert cohort_rounds == sorted(cohort_rounds), breakdown
    assert sum(n for _, n in breakdown) == 50, breakdown
    # the full registry is unchanged by the reorder
    assert len(names) == len(set(names)) == len(entrymod._all_queries())
    # freshness invariant once this window lands: nothing outside it
    # is staler than the window's own newest-taken cohort (cohorts
    # fill stalest-first, so only the LAST taken cohort may be split)
    if cohort_rounds:
        outside = set(names[50:])
        stale = {q for q in outside if last.get(q, 99) < cohort_rounds[-1]}
        assert not stale, f"stale queries left outside the window: {stale}"
    assert len(window) == 50
