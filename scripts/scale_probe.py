"""10x scale probe (VERDICT r6 next-round #4): measure, don't guess.

Generates a seed-derived ~10x slab of every testdata table in /tmp
(the read-only /root/testdata is never touched), runs the most
expensive queries once at sf0.1 and once at the slab, and records the
per-query scaling exponent  log(t_10x / t_1x) / log(10)  so SCALE.md's
plan-inspection claims become measured evidence.  An exponent near 1.0
is linear; anything well above ~1.2 is a hidden super-linear term
(bucket-occupancy blowup, window amplification, candidate-pair
explosion) that needs a fix or a documented bound.

Slab design (scaling has to preserve WORKLOAD SHAPE, not just row
counts):

- relational + events: replica-shift.  Replica k remaps every key
  (custkey/suppkey/partkey/orderkey/event_id/user_id) by +k*stride so
  referential integrity holds and key cardinality scales 10x while
  per-key fan-out (lineitems per order, events per user) stays
  constant — the realistic growth regime for a fact schema.
- documents: replica k>0 suffixes every whitespace token with "~rk",
  so cross-replica shingle Jaccard is exactly 0 and within-replica
  near-dup structure is preserved verbatim.  Dup DENSITY (dups per
  document) therefore stays constant as the corpus grows — real
  corpora do not acquire 10x more dups per doc when they grow 10x.
  (Caveat: suffixed tokens defeat stopword lists, so lang-id
  selectivity shifts on replicas k>0; timing-irrelevant.  Second
  caveat, measured r8: suffixing LENGTHENS within-replica shared
  substrings, so substring-threshold workloads explode output 3,584x
  at 10x — for those use doc_mode="remap", a per-replica bijective
  character rotation that preserves lengths and within-replica
  substring geometry exactly while destroying cross-replica overlap.)
- embeddings: replica k applies a seed-derived SIGNED DIMENSION
  PERMUTATION (an orthogonal isometry): within-replica distances,
  cluster geometry, and label structure are preserved exactly, while
  a vector and its replica image decorrelate (expected cosine ~0), so
  no artificial cross-replica near-dup clusters appear.

Usage:
    python scripts/scale_probe.py generate [slab_dir]
    python scripts/scale_probe.py run [slab_dir] [baseline_sf_dir]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

REPLICAS = 10
SEED = 20260814
BASE = "/root/testdata/sf0.1"
SLAB = "/tmp/scale10"

# key columns to shift per table: {table: {column: stride}}
# Strides are the sf0.1 key-space sizes (power-of-10 padded so shifted
# keys never collide across replicas).
_STRIDES = {
    "customer": {"c_custkey": 100_000},
    "supplier": {"s_suppkey": 10_000},
    "part": {"p_partkey": 100_000},
    "orders": {"o_orderkey": 1_000_000, "o_custkey": 100_000},
    "lineitem": {
        "l_orderkey": 1_000_000,
        "l_partkey": 100_000,
        "l_suppkey": 10_000,
    },
    "events": {"event_id": 10_000_000, "user_id": 1_000_000},
    # region/nation: fixed dimensions, copied once (not scaled) —
    # dimension tables do not grow with fact volume.
}


def _shift_replica(table: pa.Table, shifts: dict[str, int], k: int) -> pa.Table:
    for col, stride in shifts.items():
        idx = table.schema.get_field_index(col)
        shifted = pc.add(table.column(col), pa.scalar(k * stride, pa.int64()))
        table = table.set_column(idx, col, shifted)
    return table


def _documents_replica(table: pa.Table, k: int, mode: str = "suffix") -> pa.Table:
    if k == 0:
        return table
    idx = table.schema.get_field_index("text")
    if mode == "suffix":
        # token~rk suffixing via one vectorized regex: append the
        # replica tag to every run of non-space characters.
        tagged = pc.replace_substring_regex(
            table.column("text"), pattern=r"(\S+)", replacement=rf"\1~r{k}"
        )
    elif mode == "remap":
        # Character-remap replicas (VERDICT r8 #5): a bijective
        # per-replica character rotation (letters mod 26, digits mod
        # 10; whitespace/punct untouched).  Unlike suffixing it
        # preserves text LENGTHS and within-replica substring
        # structure EXACTLY — the winnow fingerprint geometry of each
        # replica is congruent to the base corpus — while any shared
        # substring/shingle across replicas is destroyed (identity
        # only at k ≡ 0 mod lcm(26,10)=130, beyond any probe depth).
        # Suffix mode lengthens within-replica shared substrings past
        # the winnow threshold (measured: output 3,584x at 10x), so
        # substring-threshold probes need THIS mode for a shape-true
        # scaling curve.
        # ADVICE r9: translate the UTF-8 DATA BUFFER bytes directly
        # (one C-level bytes.translate per chunk) instead of
        # round-tripping every string through Python.  Safe because
        # the rotation maps single ASCII bytes to single ASCII bytes
        # (all < 0x80) and leaves everything else — including any
        # multi-byte UTF-8 lead/continuation bytes, all >= 0x80 —
        # untouched, so offsets and validity carry over unchanged.
        lo = "abcdefghijklmnopqrstuvwxyz"
        hi = lo.upper()
        dg = "0123456789"
        rotated = (
            lo[k % 26:] + lo[: k % 26]
            + hi[k % 26:] + hi[: k % 26]
            + dg[k % 10:] + dg[: k % 10]
        )
        byte_trans = bytes.maketrans(
            (lo + hi + dg).encode("ascii"), rotated.encode("ascii")
        )
        col = table.column("text")
        chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
        out_chunks = []
        for arr in chunks:
            validity, offsets, data = arr.buffers()
            translated = pa.py_buffer(data.to_pybytes().translate(byte_trans))
            out_chunks.append(
                pa.Array.from_buffers(
                    arr.type,
                    len(arr),
                    [validity, offsets, translated],
                    null_count=arr.null_count,
                    offset=arr.offset,
                )
            )
        tagged = pa.chunked_array(out_chunks, type=chunks[0].type)
    elif mode == "dup":
        # HIGH-DUPLICATION slab (VERDICT r11 wrong #1 done-condition):
        # replicas keep their text VERBATIM (only doc_id shifts), so
        # every >= k-token gram duplicates across all replicas and the
        # ExactSubstr removal frame (one row per duplicated document,
        # with its full position array) grows ~linearly with the
        # corpus — the regime the suffix/remap modes deliberately
        # avoid (they preserve dup DENSITY).  Use this mode ONLY for
        # the removal-action operators; it is shape-false for
        # everything else.
        tagged = table.column("text")
    else:
        raise ValueError(f"unknown documents replica mode {mode!r}")
    table = table.set_column(idx, "text", tagged)
    didx = table.schema.get_field_index("doc_id")
    table = table.set_column(
        didx, "doc_id", pc.add(table.column("doc_id"), pa.scalar(k * 100_000, pa.int64()))
    )
    # n_chars must stay consistent with the rewritten text (remap is
    # length-preserving, suffix is not — recompute for both)
    nidx = table.schema.get_field_index("n_chars")
    table = table.set_column(
        nidx, "n_chars", pc.cast(pc.utf8_length(table.column("text")), pa.int64())
    )
    return table


def _embeddings_replica(table: pa.Table, k: int, rng: np.random.Generator) -> pa.Table:
    vecs = np.asarray(table.column("embedding").to_pylist(), dtype=np.float32)
    if k > 0:
        dim = vecs.shape[1]
        perm = rng.permutation(dim)
        signs = rng.choice(np.array([-1.0, 1.0], dtype=np.float32), size=dim)
        vecs = vecs[:, perm] * signs[None, :]
    ids = pc.add(table.column("vec_id"), pa.scalar(k * 100_000, pa.int64()))
    emb = pa.array(list(vecs), type=pa.list_(pa.float32()))
    return pa.table(
        {"vec_id": ids, "embedding": emb, "label": table.column("label")}
    )


def generate(slab_dir: str = SLAB, base: str = BASE,
             replicas: int = REPLICAS, doc_mode: str = "suffix") -> None:
    replicas = int(replicas)
    out = Path(slab_dir)
    out.mkdir(parents=True, exist_ok=True)
    for t in ("region", "nation"):
        src = pq.read_table(f"{base}/{t}.parquet")
        pq.write_table(src, out / f"{t}.parquet")
        print(f"{t}: copied (dimension)", flush=True)
    for t, shifts in _STRIDES.items():
        src = pq.read_table(f"{base}/{t}.parquet")
        parts = [_shift_replica(src, shifts, k) for k in range(replicas)]
        pq.write_table(pa.concat_tables(parts), out / f"{t}.parquet")
        print(f"{t}: {src.num_rows} -> {src.num_rows * replicas}", flush=True)
    src = pq.read_table(f"{base}/documents.parquet")
    parts = [_documents_replica(src, k, doc_mode) for k in range(replicas)]
    pq.write_table(pa.concat_tables(parts), out / "documents.parquet")
    print(f"documents: {src.num_rows} -> {src.num_rows * replicas}", flush=True)
    src = pq.read_table(f"{base}/embeddings.parquet")
    rng = np.random.default_rng(SEED)
    parts = [_embeddings_replica(src, k, rng) for k in range(replicas)]
    pq.write_table(pa.concat_tables(parts), out / "embeddings.parquet")
    print(f"embeddings: {src.num_rows} -> {src.num_rows * replicas}", flush=True)


# The probe set: the judge-bench top spenders + every family with a
# plausible super-linear failure mode (candidate generation, iterative
# graph, stateful windows, composite chain, multi-join relational).
PROBE_QUERIES = [
    "minhash_pairs",
    "minhash_dedup_corpus",
    "near_dedup_corpus",
    "incremental_dedup",
    "dup_clusters",
    "embedding_near_dup_multiband",
    "semantic_dedup",
    "kmeans_centroids",
    "ann_ivf",
    "ann_pq",
    "hll_distinct_users",
    "cms_heavy_users",
    "approx_quantiles_value",
    "count_or_time_sessions",
    "tfidf_top_terms",
    "dsir_sample",
    "training_corpus_e2e",
    "triangle_count_nations",
    "q9_product_profit",
    "q21_waiting_suppliers",
    # round 10: the curation battery + candidate-bounded verifiers
    "gopher_quality",
    "edit_distance_near_dup",
    "hard_negatives",
]


def _probe_calibration() -> tuple[float, float]:
    """One (spin, pspin) sample — the bench's host calibrations with
    smaller quanta (VERDICT r9 "what's wrong" #3: probe exponents were
    not drift-calibrated, so a session that warmed up between sweeps
    shrank t1 denominators and inflated exponents 0.2-0.3 with every
    tN actually FASTER).  Sampled immediately before each timed run so
    each timing can be normalized by the host's concurrent-load factor
    at that moment, exactly like bench_compare normalizes cross-round
    ratios."""
    from bench import _parallel_spin_calibration, _spin_calibration

    return (
        round(_spin_calibration(iters=10_000_000), 3),
        round(_parallel_spin_calibration(iters=5_000_000), 3),
    )


def run(slab_dir: str = SLAB, base: str = BASE,
        out_path: str = "/tmp/scale_probe.json",
        names: list[str] | None = None, warm: bool = False) -> None:
    import __spark_entry__ as entrymod
    from cdp_spark.session import get_spark

    # Auto-detect the slab's actual scale factor (10x, 30x, ...) so
    # the exponent denominator is always right for deeper probes.
    scale = (
        pq.read_metadata(f"{slab_dir}/lineitem.parquet").num_rows
        / pq.read_metadata(f"{base}/lineitem.parquet").num_rows
    )
    print(f"# slab scale: {scale:.1f}x", file=sys.stderr, flush=True)

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    # Warm the JVM/codegen paths once so the sf0.1 pass is not
    # penalized by session cold-start relative to the slab pass.
    qs["text_stats"](spark, base).count()

    results: dict[str, dict] = {
        "_meta_calibration": {
            "spin_iters": 10_000_000,
            "pspin_iters": 5_000_000,
            "pspin_procs": os.cpu_count() or 1,
            "note": (
                "spin_/pspin_<tag> sampled immediately before each "
                "timed run; exponent_norm divides each timing by its "
                "pspin sample (concurrent-load units) before the "
                "log-ratio, so session warm-up or co-tenant drift "
                "between t1 and tN no longer moves the exponent"
            ),
        }
    }
    for name in (names or PROBE_QUERIES):
        fn = qs[name]
        rec: dict = {}
        for tag, sf_dir in (("t1", base), ("t10", slab_dir)):
            print(f"START {name} {tag}", file=sys.stderr, flush=True)
            if warm:
                # WARMED protocol (r15: the first knn probe's t1 leg
                # was cold-codegen-dominated, inflating the exponent):
                # run the leg once untimed so JVM/codegen/file-listing
                # caches are hot, then time the second run.
                fn(spark, sf_dir).count()
            spin, pspin = _probe_calibration()
            rec[f"spin_{tag}"] = spin
            rec[f"pspin_{tag}"] = pspin
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()
            rec[tag] = round(time.perf_counter() - t0, 3)
            rec[f"rows_{tag}"] = n
        rec["warmed"] = bool(warm)
        rec["ratio"] = round(rec["t10"] / rec["t1"], 2)
        rec["scale"] = round(scale, 1)
        rec["exponent"] = round(
            math.log(rec["t10"] / rec["t1"]) / math.log(scale), 2
        )
        rec["exponent_norm"] = round(
            math.log(
                (rec["t10"] / rec["pspin_t10"])
                / (rec["t1"] / rec["pspin_t1"])
            )
            / math.log(scale),
            2,
        )
        if rec["rows_t1"] and rec["rows_t10"]:
            # Work-per-OUTPUT-row exponent (VERDICT r12 next #2): for
            # output-bound regimes (the adversarial multiband LSH,
            # where the true pair count itself grows super-linearly)
            # the honest reading divides each load-normalized timing
            # by the rows it emitted — ~0 means time tracks output
            # (optimal: no algorithm emits quadratic output in linear
            # time); anything well above ~0.3 is real per-pair work
            # growth, i.e. an algorithmic problem the raw exponent
            # only hints at.
            rec["exponent_norm_per_row"] = round(
                math.log(
                    ((rec["t10"] / rec["pspin_t10"]) / rec["rows_t10"])
                    / ((rec["t1"] / rec["pspin_t1"]) / rec["rows_t1"])
                )
                / math.log(scale),
                2,
            )
        results[name] = rec
        print(name, rec, flush=True)
        # incremental dump so a stalled query never loses prior results
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
    spark.stop()
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "generate"
    if cmd == "generate":
        # scale_probe.py generate [slab] [base] [replicas] [doc_mode]
        generate(*(sys.argv[2:6] or [SLAB]))
    elif cmd == "run":
        # scale_probe.py run [--warm] [slab] [base] [out] [names...]
        args = sys.argv[2:]
        warm = "--warm" in args
        args = [a for a in args if a != "--warm"]
        paths = [SLAB, BASE, "/tmp/scale_probe.json"]
        paths[: min(len(args), 3)] = args[:3]
        run(*paths, names=args[3:] or None, warm=warm)
    else:
        raise SystemExit(f"unknown command {cmd!r}")
