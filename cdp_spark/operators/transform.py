"""send-receive transforms: pipe each window vector through an
external program/service; its output becomes the new events.

- send-receive-jq (src/step-functions/send-receive-jq.ts:70-95): the
  reference's workhorse transform.  Spark mapping: windows are
  collected to one row each, a partition-level ``mapInPandas`` feeds
  all vectors of an Arrow batch to ONE ``jq`` subprocess (one JSON
  array per line), and the program is wrapped as ``[try (...)]`` so
  (a) runtime errors silently skip the vector (parity with the
  ``try``-wrap at src/io/jq.ts:14-24) and (b) each input line maps to
  exactly one output line, keeping window attribution deterministic.
- send-receive-http (src/step-functions/send-receive-http.ts:96-143):
  POST each vector as NDJSON; the response body becomes the new
  events; request errors yield an empty vector.  Partition-level
  batched HTTP with retry/backoff (src/io/http-client.ts:28-56) —
  this is the external-model-inference hook.
- send-receive-jsonnet (src/step-functions/send-receive-jsonnet.ts:70-97
  -> stream-jsonnet/main.go:18-70): same adapter shape as jq, but the
  ``function(events)`` program runs in-process on each executor via
  :mod:`cdp_spark.jsonnet` (pure-Python lazy evaluator — no subprocess,
  no jsonnet library dependency).

Output values are parsed back into events with the shared
variants_to_events (old-event semantics; wrap directive supported),
so invalid outputs drop silently like the reference.
"""

from __future__ import annotations

import json
import subprocess
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..events import TRACE_TYPE, WrapDirective, validate_wrap, variants_to_events
from ..windows import WINDOW_COL


def _serialized_vector_col(order_col: str) -> Column:
    """Array-of-events JSON for one window, in arrival order: the
    vector-in wire shape the reference feeds to jq/HTTP.  Built as ONE
    F.expr (single JVM parse) instead of ~25 Column-builder py4j round
    trips — this runs inside every per-micro-batch pipeline compile
    (optimization r17); the parsed tree is the prior Column form's."""
    nm = "to_json(array(e.n))"
    return F.expr(
        "concat('[', array_join(transform(array_sort(collect_list("
        f"struct(`{order_col}` AS o, n, d, "
        "coalesce(to_json(t), '[]') AS t))), "
        "e -> concat('{\"n\":', "
        f"substring({nm}, 2, length({nm}) - 2), "
        "CASE WHEN e.d IS NOT NULL THEN concat(',\"d\":', e.d) "
        "ELSE '' END, "
        "',\"t\":', e.t, '}')), ','), ']')"
    )


def _collect_vectors(df: DataFrame, order_col: str) -> DataFrame:
    """(window id, min order, vector-json) — one row per window."""
    w = WINDOW_COL if WINDOW_COL in df.columns else None
    grouped = df.groupBy(F.col(w).alias("_w")) if w else df.groupBy(F.lit(1).alias("_w"))
    return grouped.agg(
        F.min(order_col).alias("_worder"),
        _serialized_vector_col(order_col).alias("_vec"),
    )


def _values_to_events(
    produced: DataFrame, wrap: WrapDirective, max_array_depth: int = 5
) -> DataFrame:
    """produced: (_worder, _idx, _val JSON-text) -> event rows with a
    deterministic order column ``_ord`` (window order, then output
    index)."""
    validate_wrap(wrap)
    # The order column is the lexicographic struct (window order,
    # output index) — NOT a packed `_worder * 2^20 + _idx` long
    # (overflows: _worder derives from monotonically_increasing_id,
    # partition_id << 33) and NOT an eager dense renumber (executing
    # the plan at build time breaks the sink-before-output ordering
    # contract, and a lazy two-branch renumber re-runs the jq/jsonnet
    # subprocess and double-fires observed metrics — the r3
    # regression).  Struct _ord is plan-only: zero extra stages, total
    # order, unique.  Consumers needing a dense long derive it with
    # one row_number over this column (the pipeline compiler's
    # _renumber already does exactly that).
    ord_col = F.struct("_worder", "_idx").alias("_ord")
    if wrap is not None:
        name = wrap if isinstance(wrap, str) else wrap["name"]
        return produced.select(
            F.lit(name).alias("n"),
            F.col("_val").alias("d"),
            F.lit(None).cast(TRACE_TYPE).alias("t"),
            ord_col,
        )
    parsed = produced.select(
        ord_col, F.try_parse_json("_val").alias("_v")
    ).filter(F.col("_v").isNotNull())
    out = variants_to_events(parsed, keep_cols=["_ord"], max_array_depth=max_array_depth)
    return out.filter(F.col("_reason").isNull()).select("n", "d", "t", "_ord")


def jq_produced_values(
    df: DataFrame,
    jq_expr: str,
    order_col: str = "_ord",
    prelude: Optional[str] = None,
    jq_bin: str = "jq",
) -> DataFrame:
    """Run a jq program over each window vector; returns the raw
    produced values as (_worder, _idx, _val JSON-text) — used directly
    by sinks with a jq-expr, and by send_receive_jq for the
    value->event path.

    Scale shape: one subprocess per Arrow batch per partition — the
    JSON round-trip is the cost, amplification is bounded by the jq
    program.  cites src/step-functions/send-receive-jq.ts:70-95,
    src/io/json-processor.ts:115-187.
    """
    program = f"[ try ( {(prelude + chr(10)) if prelude else ''}{jq_expr} ) ]"
    # Fail fast on a bad program (parity: the reference errors at
    # pipeline start, src/io/jq.ts) — run once against an empty array.
    probe = subprocess.run(
        [jq_bin, "-c", program], input="[]", capture_output=True, text=True
    )
    if probe.returncode != 0:
        raise ValueError(f"invalid jq program: {probe.stderr.strip()}")

    vectors = _collect_vectors(df, order_col)

    def run_jq(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            lines = "\n".join(pdf["_vec"].tolist()) + "\n"
            proc = subprocess.run(
                [jq_bin, "-c", program], input=lines, capture_output=True, text=True
            )
            out_lines = proc.stdout.splitlines()
            # [try (...)] guarantees 1:1 line mapping unless jq died
            # mid-stream; attribute what we can, drop the rest.
            rows = []
            for worder, out in zip(pdf["_worder"].tolist(), out_lines):
                try:
                    values = json.loads(out)
                except ValueError:
                    continue
                for idx, val in enumerate(values):
                    rows.append(
                        (worder, idx, json.dumps(val, separators=(",", ":"), ensure_ascii=False))
                    )
            yield pd.DataFrame(rows, columns=["_worder", "_idx", "_val"])

    return vectors.mapInPandas(run_jq, schema="_worder long, _idx long, _val string")


def send_receive_jq(
    df: DataFrame,
    jq_expr: str,
    order_col: str = "_ord",
    prelude: Optional[str] = None,
    wrap: WrapDirective = None,
    jq_bin: str = "jq",
) -> DataFrame:
    """jq transform step: produced values parsed back into events
    (src/step-functions/send-receive-jq.ts:70-95)."""
    produced = jq_produced_values(df, jq_expr, order_col, prelude, jq_bin)
    return _values_to_events(produced, wrap)


def send_receive_http(
    df: DataFrame,
    target: str,
    order_col: str = "_ord",
    method: str = "POST",
    headers: Optional[dict[str, str]] = None,
    wrap: WrapDirective = None,
    max_retries: int = 4,
    backoff_factor: float = 1.0,
    timeout: float = 60.0,
    jq_expr: Optional[str] = None,
    jq_prelude: Optional[str] = None,
    jsonnet_expr: Optional[str] = None,
    jsonnet_prelude: Optional[str] = None,
) -> DataFrame:
    """POST each window vector as NDJSON to ``target``; the response
    body (NDJSON of values) becomes the new events.  Errors (network,
    non-2xx after retries) produce an empty vector, matching
    src/step-functions/send-receive-http.ts:96-143.

    With ``jq_expr`` / ``jsonnet_expr`` the vector is first piped
    through the program and each produced value is sent as ONE
    request whose body is the JSON-encoded value (the reference's
    optional pre-transform, send-receive-http.ts:104-121 — e.g. the
    external-processing example posts ``map(.d)`` as a single JSON
    array instead of NDJSON).
    """
    import requests  # gated: available in this env, but optional

    validate_wrap(wrap)
    if jq_expr is not None and jsonnet_expr is not None:
        raise ValueError("jq-expr and jsonnet-expr are mutually exclusive")
    if jq_expr is not None or jsonnet_expr is not None:
        if jq_expr is not None:
            produced = jq_produced_values(df, jq_expr, order_col, jq_prelude)
        else:
            produced = jsonnet_produced_values(df, jsonnet_expr, order_col, jsonnet_prelude)
        return _http_per_value(
            produced, target, method, headers, wrap, max_retries, backoff_factor, timeout
        )
    vectors = _collect_vectors(df, order_col)
    hdrs = {"Content-Type": "application/x-ndjson", **(headers or {})}

    def call(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import time

        session = requests.Session()
        for pdf in batches:
            rows = []
            for worder, vec in zip(pdf["_worder"].tolist(), pdf["_vec"].tolist()):
                body = "\n".join(json.dumps(e) for e in json.loads(vec)) + "\n"
                text = None
                for attempt in range(max_retries + 1):
                    try:
                        resp = session.request(
                            method, target, data=body.encode(), headers=hdrs, timeout=timeout
                        )
                        if resp.status_code >= 500 and attempt < max_retries:
                            time.sleep(backoff_factor * (2**attempt))
                            continue
                        if 200 <= resp.status_code < 300:
                            text = resp.text
                        break
                    except requests.RequestException:
                        if attempt < max_retries:
                            time.sleep(backoff_factor * (2**attempt))
                        else:
                            break
                if text is None:
                    continue
                idx = 0
                for line in text.splitlines():
                    line = line.strip()
                    if not line:
                        continue
                    try:
                        val = json.loads(line)
                    except ValueError:
                        continue
                    rows.append(
                        (worder, idx, json.dumps(val, separators=(",", ":"), ensure_ascii=False))
                    )
                    idx += 1
            yield pd.DataFrame(rows, columns=["_worder", "_idx", "_val"])

    produced = vectors.mapInPandas(call, schema="_worder long, _idx long, _val string")
    return _values_to_events(produced, wrap)


def _http_per_value(
    produced: DataFrame,
    target: str,
    method: str,
    headers: Optional[dict[str, str]],
    wrap: WrapDirective,
    max_retries: int,
    backoff_factor: float,
    timeout: float,
) -> DataFrame:
    """One HTTP request per pre-transformed value: body = the value's
    JSON text; each response line becomes a produced value.  Output
    order is (window, value idx, response line), densely renumbered
    before the shared value→event path."""
    import requests

    hdrs = {"Content-Type": "application/json", **(headers or {})}

    def call(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import time

        session = requests.Session()
        for pdf in batches:
            rows = []
            for worder, idx, val in zip(
                pdf["_worder"].tolist(), pdf["_idx"].tolist(), pdf["_val"].tolist()
            ):
                text = None
                for attempt in range(max_retries + 1):
                    try:
                        resp = session.request(
                            method, target, data=val.encode(), headers=hdrs, timeout=timeout
                        )
                        if resp.status_code >= 500 and attempt < max_retries:
                            time.sleep(backoff_factor * (2**attempt))
                            continue
                        if 200 <= resp.status_code < 300:
                            text = resp.text
                        break
                    except requests.RequestException:
                        if attempt < max_retries:
                            time.sleep(backoff_factor * (2**attempt))
                        else:
                            break
                if text is None:
                    continue
                line_no = 0
                for line in text.splitlines():
                    line = line.strip()
                    if not line:
                        continue
                    try:
                        out_val = json.loads(line)
                    except ValueError:
                        continue
                    rows.append(
                        (
                            worder,
                            idx,
                            line_no,
                            json.dumps(out_val, separators=(",", ":"), ensure_ascii=False),
                        )
                    )
                    line_no += 1
            yield pd.DataFrame(rows, columns=["_worder", "_idx", "_line", "_val"])

    raw = produced.mapInPandas(
        call, schema="_worder long, _idx long, _line long, _val string"
    )
    # Dense renumber (same rationale as _values_to_events): fold the
    # three-level order into the (_worder, _idx) contract it expects.
    from pyspark.sql.window import Window

    renumbered = raw.withColumn(
        "_idx2",
        F.row_number().over(Window.partitionBy("_worder").orderBy("_idx", "_line")).cast("long"),
    ).select("_worder", F.col("_idx2").alias("_idx"), "_val")
    return _values_to_events(renumbered, wrap)


def jsonnet_produced_values(
    df: DataFrame,
    jsonnet_expr: str,
    order_col: str = "_ord",
    prelude: Optional[str] = None,
) -> DataFrame:
    """Evaluate a ``function(events)`` Jsonnet program over each window
    vector; returns (_worder, _idx, _val JSON-text).  Exactly ONE value
    per window (_idx == 0): the reference's stream-jsonnet emits one
    compacted line per input vector (stream-jsonnet/main.go:43-60),
    unlike jq's zero-or-more stream outputs.  Windows whose evaluation
    errors produce nothing (main.go:46-52 skips erroring inputs).

    Scale shape: the evaluator is pure Python running inside
    mapInPandas — per-partition, Arrow-batched, no subprocess.  The
    program parses once per batch; evaluation cost is proportional to
    the program, bounded per window.
    cites src/step-functions/send-receive-jsonnet.ts:70-97.
    """
    from ..jsonnet import (
        Closure,
        Evaluator,
        JsonnetError,
        manifest_json,
        parse as jsonnet_parse,
    )

    program = f"{(prelude + chr(10)) if prelude else ''}{jsonnet_expr}"
    # Fail fast on a bad program (parity: SnippetToAST at pipeline
    # start, stream-jsonnet/main.go:36-40).
    jsonnet_parse(program)

    vectors = _collect_vectors(df, order_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import logging

        ast = jsonnet_parse(program)
        ev = Evaluator()
        fn = ev.eval_ast(ast)
        dropped = 0
        last_err: Optional[str] = None
        for pdf in batches:
            rows = []
            for worder, vec in zip(pdf["_worder"].tolist(), pdf["_vec"].tolist()):
                events = json.loads(vec)
                try:
                    val = ev.call(fn, [events]) if isinstance(fn, Closure) else fn
                    rows.append((worder, 0, manifest_json(val)))
                except JsonnetError as exc:
                    # Parity: erroring windows are skipped silently by
                    # stream-jsonnet (main.go:46-52) — but say so, with
                    # a count, so a program bug is visible instead of
                    # a silent drop.
                    dropped += 1
                    last_err = str(exc)
            yield pd.DataFrame(rows, columns=["_worder", "_idx", "_val"])
        if dropped:
            logging.getLogger("cdp_spark.jsonnet").warning(
                "jsonnet transform dropped %d window(s); last error: %s",
                dropped,
                last_err,
            )

    return vectors.mapInPandas(run, schema="_worder long, _idx long, _val string")


def send_receive_jsonnet(
    df: DataFrame,
    jsonnet_expr: str,
    order_col: str = "_ord",
    prelude: Optional[str] = None,
    wrap: WrapDirective = None,
) -> DataFrame:
    """send-receive-jsonnet: transform event vectors with a
    ``function(events)`` Jsonnet program and parse the produced values
    back into events (src/step-functions/send-receive-jsonnet.ts:70-97
    -> src/io/jsonnet.ts:14-27 -> stream-jsonnet/main.go:18-70).
    Evaluated by :mod:`cdp_spark.jsonnet` (pure-Python subset — no
    jsonnet library ships in this environment)."""
    produced = jsonnet_produced_values(df, jsonnet_expr, order_col, prelude=prelude)
    return _values_to_events(produced, wrap)
