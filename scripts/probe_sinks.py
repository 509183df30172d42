"""Scale probe for the sink/expose FRAMING paths (VERDICT r7 #4 —
"probe the unprobed": these are pipeline components, not registry
queries, so the query probe can't reach them).

Measures at two scales and records the same ratio/exponent shape as
scripts/scale_probe.py:

- file-sink framing: events -> ordered NDJSON lines
  (sink_payload_lines) -> one output file via make_file_action.
  The single-file-in-order contract is driver-serialized by design
  (reference parity: send-file appends one file); the probe verifies
  the cost is LINEAR in rows, i.e. the framing adds no super-linear
  term on top of the unavoidable O(rows) write.
- expose ring framing: ExposeBuffer.register_window + get(key) over a
  fixed-size ring (ETag hashing + eviction bookkeeping) — must be
  O(1) per window regardless of history length.

Usage:
    python scripts/probe_sinks.py [out_json]
"""

from __future__ import annotations

import json
import math
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def probe_file_sink(spark) -> dict:
    from cdp_spark.io.sinks import make_file_action, sink_payload_lines
    from cdp_spark.session import load_table
    from pyspark.sql import functions as F

    rec: dict = {}
    for tag, sf in (("t1", "/root/testdata/sf0.01"), ("t10", "/root/testdata/sf0.1")):
        ev = load_table(spark, sf, "events").select(
            F.col("event_id").alias("_ord"),
            F.col("event_type").alias("n"),
            F.to_json(F.struct("user_id", "value")).alias("d"),
            F.array(
                F.struct(
                    F.lit("probe").alias("i"),
                    F.lit("pipeline").alias("p"),
                    F.unix_micros(F.col("ts")).alias("t"),
                )
            ).alias("t"),
        )
        out = tempfile.NamedTemporaryFile(suffix=".ndjson", delete=False)
        t0 = time.perf_counter()
        lines = sink_payload_lines(ev)
        make_file_action(lines, out.name)()
        rec[tag] = round(time.perf_counter() - t0, 3)
        with open(out.name) as fh:
            rec[f"rows_{tag}"] = sum(1 for _ in fh)
    rec["ratio"] = round(rec["t10"] / rec["t1"], 2)
    rec["scale"] = 10.0
    rec["exponent"] = round(math.log(rec["t10"] / rec["t1"]) / math.log(10), 2)
    return rec


def probe_expose_ring() -> dict:
    from cdp_spark.io.expose import ExposeBuffer

    rec: dict = {}
    for tag, n in (("t1", 20_000), ("t10", 200_000)):
        buf = ExposeBuffer(size=64)
        payload = [json.dumps({"n": "app.x", "d": i}) for i in range(8)]
        t0 = time.perf_counter()
        keys = [buf.register_window(payload) for _ in range(n)]
        # read back the last ring's worth by key (the Link-walk path)
        for k in keys[-64:]:
            assert buf.get(k) is not None
        rec[tag] = round(time.perf_counter() - t0, 3)
        rec[f"rows_{tag}"] = n
    rec["ratio"] = round(rec["t10"] / rec["t1"], 2)
    rec["scale"] = 10.0
    rec["exponent"] = round(math.log(rec["t10"] / rec["t1"]) / math.log(10), 2)
    return rec


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/probe_sinks.json"
    from cdp_spark.session import get_spark

    spark = get_spark("probe-sinks")
    spark.sparkContext.setLogLevel("ERROR")
    results = {
        "file_sink_framing": probe_file_sink(spark),
        "expose_ring_framing": probe_expose_ring(),
    }
    spark.stop()
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
    print(json.dumps(results, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
