"""Phase breakdown of stream_pipeline_keyed_stateful (VERDICT r16
next #3): wraps compile_pipeline and the on_batch collect with wall
timers to split per-batch cost into PLAN CONSTRUCTION (py4j/Catalyst)
vs EXECUTION (the collect job) vs everything else (stateful operator,
trigger scheduling).

Usage: python scripts/profile_ksr.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
import cdp_spark.streaming.runner as runner_mod
from cdp_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

COMPILE_T: list[float] = []
BATCH_WALL: list[float] = []
_orig_compile = runner_mod.compile_pipeline


def timed_compile(*a, **kw):
    t0 = time.perf_counter()
    res = _orig_compile(*a, **kw)
    COMPILE_T.append(time.perf_counter() - t0)
    return res


def main() -> None:
    runner_mod.compile_pipeline = timed_compile
    spark = get_spark("profile_ksr")
    from cdp_spark.session import load_table

    for t in ("events",):
        load_table(spark, SF_DIR, t).cache().count()

    # wrap process-batch wall time via ResultTimer on on_batch: patch
    # run_pipeline_stream to intercept the user on_batch
    orig_rps = runner_mod.run_pipeline_stream

    def wrapped_rps(template, **kw):
        user_on_batch = kw.get("on_batch")
        last = [time.perf_counter()]

        def on_batch(df, e):
            t0 = time.perf_counter()
            user_on_batch(df, e)
            t1 = time.perf_counter()
            BATCH_WALL.append(t1 - t0)
            last[0] = t1

        if user_on_batch is not None:
            kw["on_batch"] = on_batch
        return orig_rps(template, **kw)

    entry.run_pipeline_stream = wrapped_rps
    import cdp_spark.streaming as streaming_pkg

    streaming_pkg.run_pipeline_stream = wrapped_rps
    # q_... imports run_pipeline_stream inside the function body from
    # cdp_spark.streaming — patch there.

    t0 = time.perf_counter()
    out = entry.queries()["stream_pipeline_keyed_stateful"](spark, SF_DIR)
    n = out.count()
    total = time.perf_counter() - t0
    print(f"total query wall: {total:.3f}s rows={n}")
    print(
        f"compile_pipeline: n={len(COMPILE_T)} sum={sum(COMPILE_T):.3f}s "
        f"each={[round(x, 3) for x in COMPILE_T]}"
    )
    print(
        f"on_batch collect: n={len(BATCH_WALL)} sum={sum(BATCH_WALL):.3f}s "
        f"each={[round(x, 3) for x in BATCH_WALL]}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
