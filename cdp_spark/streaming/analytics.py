"""Event-time streaming aggregation with watermarks — the capability
SURVEY §2.6 declares as Spark's addition over the reference (whose
windows are processing-time + arrival-count only, src/step.ts:76-77).

Two shapes:

- :func:`stream_time_window_agg` — tumbling event-time windows
  (``F.window``) with a watermark: late events inside the watermark
  delay are GUARANTEED to merge into their window (the strict side of
  Spark's watermark contract); events later than the watermark lose
  that guarantee — the engine may aggregate them (this Spark build
  admits them as a late singleton window) or drop them, and their
  state is evicted as the watermark advances (bounded state at any
  scale — without the watermark, streaming window state grows
  forever).
- :func:`stream_session_windows` — gap-based sessions
  (``F.session_window``): the streaming twin of the batch
  ``session_gap`` query, with the same 30-minute default gap.

Scale: state lives in the state store partitioned by (key, window);
the shuffle is the same hash exchange the batch aggregate uses, and
AQE sizes the micro-batch side.  Watermark delay bounds both state
size and result latency — pick it from the source's real out-of-
orderness, not from the window length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def stream_time_window_agg(
    stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    value_col: str = "value",
    keys: list[str] | None = None,
) -> DataFrame:
    """Tumbling event-time aggregation: (window, *keys) -> count and
    exact decimal sum.  Late data within ``watermark`` merges into its
    window (guaranteed); later data has no guarantee — state for
    passed windows is evicted, each window is emitted exactly once in
    append mode."""
    group: list[Column | str] = [F.window(F.col(ts_col), window)]
    group += list(keys or [])
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*group)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col(value_col).cast("decimal(28,6)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *(keys or []),
            "n_events",
            "sum_value",
        )
    )


def stream_session_windows(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Gap-based event-time sessions per key — the streaming twin of
    the batch ``session_gap`` query (same inactivity-gap semantics,
    here with dynamic session merging as late events arrive inside
    the watermark)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col(value_col).cast("decimal(28,6)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col(key_col),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def stream_near_dup_flags(
    stream_docs: DataFrame,
    corpus_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    num_perm: int = 32,
    bands: int = 8,
    n: int = 3,
    hash_fn=None,
) -> DataFrame:
    """Streaming near-dup flagging against a STATIC corpus — the
    dedup-on-ingest path: every streamed document is MinHash-banded
    with pure Column expressions (shingle -> signature -> band keys
    run inside the micro-batch, no state), candidates come from a
    stream-static equi-join on (band, bucket) against the corpus's
    precomputed band index, and exact Jaccard verifies against the
    corpus shingle arrays.  Output: one row per duplicated streamed
    doc — (id, dup_of, jaccard) with dup_of the minimum matching
    corpus id (order-insensitive, so micro-batch boundaries cannot
    change the answer; the driver value-hashes it against the batch
    oracle).

    Scope: flags stream-vs-corpus duplicates only.  Stream-vs-stream
    duplicates within the increment need keyed state
    (dropDuplicatesWithinWatermark on a content key, or the batch
    incremental_near_dups over the accumulated increment) — kept out
    so the join stays stateless and the per-batch cost stays
    O(batch x bucket-occupancy).

    At 100 TB the static side is the persisted signature index
    (datapipe.dedup.minhash_signatures_df written at ingest), loaded
    once per stream start; the band join broadcasts only if the
    corpus index fits — otherwise it is a shuffled stream-static
    join, which Spark executes per micro-batch against the static
    side's materialized exchange.
    """
    from ..datapipe import dedup as ddp

    if hash_fn is None:
        hash_fn = ddp.default_hash64
    rows = num_perm // bands
    bucket_fn = None if hash_fn is ddp.default_hash64 else hash_fn

    enriched = ddp._enrich_signatures(
        corpus_docs, id_col, text_col, num_perm, n, hash_fn
    )
    corpus_bands = enriched.select(
        F.col("_id").alias("_old_id"),
        F.explode(
            ddp.lsh_band_keys(F.col("signature"), bands, rows, bucket_fn)
        ).alias("bk"),
    ).select(
        "_old_id",
        F.col("bk.band").alias("band"),
        F.col("bk.bucket").alias("bucket"),
    )
    corpus_sh = enriched.select(
        F.col("_id").alias("_old_id"), F.col("_sh").alias("_old_sh")
    )

    s = stream_docs.select(
        F.col(id_col).alias("_new_id"), F.col(text_col).alias("_t")
    ).filter(F.size(ddp.tokens(F.col("_t"))) > 0)
    s = ddp.attach_minhash_signature(
        s.select("_new_id", ddp.shingles(F.col("_t"), n).alias("_new_sh")),
        ["_new_id", "_new_sh"],
        "_new_sh",
        num_perm,
        42,
        hash_fn,
    )
    cands = (
        s.select(
            "_new_id",
            "_new_sh",
            F.explode(
                ddp.lsh_band_keys(F.col("signature"), bands, rows, bucket_fn)
            ).alias("bk"),
        )
        .select(
            "_new_id",
            "_new_sh",
            F.col("bk.band").alias("band"),
            F.col("bk.bucket").alias("bucket"),
        )
        .join(corpus_bands, ["band", "bucket"])
        .join(corpus_sh, "_old_id")
    )
    inter = F.size(F.array_intersect("_new_sh", "_old_sh")).cast("double")
    union = F.size(F.array_union("_new_sh", "_old_sh")).cast("double")
    jac = F.round(
        F.when(union > 0, inter / union).otherwise(F.lit(0.0)), 6
    )
    verified = cands.withColumn("jaccard", jac).filter(
        F.col("jaccard") >= threshold
    )
    best = F.min(F.struct(F.col("_old_id"), F.col("jaccard"))).alias("_best")
    return (
        verified.groupBy("_new_id")
        .agg(best)
        .select(
            F.col("_new_id").alias(id_col),
            F.col("_best._old_id").alias("dup_of"),
            F.col("_best.jaccard").alias("jaccard"),
        )
    )


def stream_simhash_flags(
    stream_docs: DataFrame,
    corpus_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 5,
    n_chunks: int = 6,
    bits: int = 64,
    hash_fn=None,
) -> DataFrame:
    """Streaming SimHash dedup gate against a STATIC corpus — the
    fingerprint twin of :func:`stream_near_dup_flags`: every streamed
    document's 64-bit SimHash and Manku chunk keys compute inside the
    micro-batch (pure Columns, no state), candidates come from a
    stream-static equi-join on (band, bucket) against the corpus's
    chunk index, and the exact ``bit_count(xor) <= max_hamming``
    verify replays the batch operator — the banding is lossless
    (pigeonhole, chunks cover all bits), so the flagged set is
    EXACTLY the streamed docs within hamming ``max_hamming`` of some
    corpus doc.  Output: (id, dup_of, hamming) with dup_of the
    closest corpus partner (min hamming, ties to the lowest corpus
    id) — an order-insensitive min-struct aggregate, so micro-batch
    boundaries cannot change the answer.

    Scale shape: the static side is (id, fingerprint, chunk) rows —
    24 bytes per chunk per doc, ~100x lighter than the MinHash band
    index with its shingle arrays — so at 100 TB the corpus index
    broadcasts far longer before falling back to a shuffled
    stream-static join; the fingerprint rides the chunk index
    (one long) so the verify needs NO second corpus join.

    Implementation: ONE pipeline shared with the persisted-index path
    — the corpus fingerprints here are exactly an in-memory
    :func:`~cdp_spark.datapipe.dedup_index.simhash_index_write`
    frame, so this delegates to ``flag_against_simhash_index`` (same
    chunking, verify, tie rule, empty-token filtering on both sides)
    instead of hand-copying the join tail a third time."""
    from ..datapipe import dedup as ddp
    from ..datapipe.dedup_index import (
        _fingerprint_frame,
        _hash_name,
        flag_against_simhash_index,
    )

    if hash_fn is None:
        hash_fn = ddp.default_hash64
    corpus = _fingerprint_frame(
        corpus_docs, id_col, text_col, hash_fn
    ).localCheckpoint(eager=True)
    meta = {"kind": "simhash", "bits": bits, "hash": _hash_name(hash_fn)}
    return flag_against_simhash_index(
        stream_docs, corpus, meta,
        id_col=id_col, text_col=text_col,
        max_hamming=max_hamming, n_chunks=n_chunks,
    )


def stream_incremental_near_dups(
    stream_docs: DataFrame,
    corpus_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 32,
    bands: int = 8,
    n: int = 3,
    hash_fn=None,
    max_bucket_members: int | None = None,
    key_buckets: int | None = None,
) -> DataFrame:
    """FULL streaming incremental near-dedup: flag streamed documents
    that duplicate the static corpus OR an EARLIER streamed document
    — the stateful completion of :func:`stream_near_dup_flags`.

    Two candidate paths, unioned into one append-mode pair stream:

    - new x old: the stateless stream-static (band, bucket) join
      against the corpus band index (as in stream_near_dup_flags),
      with intersection/union sizes computed engine-side.
    - new x new: ``applyInPandasWithState`` keyed by (band, bucket).
      State = the bucket's streamed members so far (ids + shingle
      sets, JSON-encoded like the count-or-time operator).  Each
      arriving member emits one candidate row against every earlier
      member of its bucket; within a micro-batch members process in
      ascending id order, so every unordered pair is emitted exactly
      once per bucket regardless of arrival order.

    Determinism: "earlier" is defined by the dedup PRECEDENCE ORDER
    (corpus docs first, then streamed docs by ascending id), NOT by
    arrival time — so the flagged doc of a new-new pair is always the
    LARGER id and the result is independent of micro-batch boundaries;
    the driver value-hashes the reduced output against the batch
    incremental oracle.

    Output (append stream): candidate rows
    (id, partner, p_new, inter_n, union_n) — exact integers, so the
    jaccard division and rounding happen engine-side afterwards
    (:func:`reduce_incremental_pairs`), never in Python float.

    Scale: per-bucket state grows with the increment's bucket
    occupancy (shingle sets included — the verify payload).  At
    100 TB bound it two ways (ADVICE r8):

    - ``max_bucket_members`` caps each (band, bucket) state: once a
      bucket holds that many streamed members, later arrivals still
      flag AGAINST the held members but are not retained as future
      partners (bounded recall loss, same trade as the batch
      occupancy cap; logged executor-side when first hit).  State
      writes are also skipped whenever a batch leaves a bucket's
      membership unchanged — a hot capped bucket stops re-encoding
      its JSON blob every micro-batch.
    - restart the increment periodically by FOLDING survivors into
      the persisted corpus index
      (:func:`cdp_spark.datapipe.dedup_index.minhash_index_fold`) and
      clearing the checkpoint — the state is the increment, not the
      corpus, and the fold makes that true indefinitely
      (fold-then-flag == flag-against-rebuilt-corpus, oracled by the
      ``fold_incremental_dedup`` driver query).

    ``key_buckets`` (optimization r17, guide §4): most (band, bucket)
    groups hold one or two rows per trigger, so per-GROUP state pays
    one Python call + one state-store row per occupied bucket per
    batch — thousands of calls of pure overhead.  Pass a bucket count
    to group by ``pmod(xxhash64(band, bucket), key_buckets)`` and run
    the SAME per-(band, bucket) pairing inside the physical bucket:
    state becomes one JSON object mapping "band:bucket" -> members,
    each logical bucket keeps its own member list, cap, and
    ascending-id processing order, so the emitted candidate set is
    IDENTICAL (pinned by test) at O(key_buckets) Python calls and
    state rows per trigger.  Trade: a changed physical bucket
    re-encodes its whole map (the per-logical-bucket skip only
    applies bucket-internally), the usual bucketing trade.
    """
    import json as _json

    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..datapipe import dedup as ddp

    if hash_fn is None:
        hash_fn = ddp.default_hash64
    rows = num_perm // bands
    bucket_fn = None if hash_fn is ddp.default_hash64 else hash_fn

    enriched = ddp._enrich_signatures(
        corpus_docs, id_col, text_col, num_perm, n, hash_fn
    )
    corpus_bands = enriched.select(
        F.col("_id").alias("_old_id"),
        F.explode(
            ddp.lsh_band_keys(F.col("signature"), bands, rows, bucket_fn)
        ).alias("bk"),
    ).select(
        "_old_id",
        F.col("bk.band").alias("band"),
        F.col("bk.bucket").alias("bucket"),
    )
    corpus_sh = enriched.select(
        F.col("_id").alias("_old_id"), F.col("_sh").alias("_old_sh")
    )

    s = stream_docs.select(
        F.col(id_col).alias("_new_id"), F.col(text_col).alias("_t")
    ).filter(F.size(ddp.tokens(F.col("_t"))) > 0)
    s = ddp.attach_minhash_signature(
        s.select("_new_id", ddp.shingles(F.col("_t"), n).alias("_new_sh")),
        ["_new_id", "_new_sh"],
        "_new_sh",
        num_perm,
        42,
        hash_fn,
    )
    banded = s.select(
        "_new_id",
        "_new_sh",
        F.explode(
            ddp.lsh_band_keys(F.col("signature"), bands, rows, bucket_fn)
        ).alias("bk"),
    ).select(
        "_new_id",
        "_new_sh",
        F.col("bk.band").alias("band"),
        F.col("bk.bucket").alias("bucket"),
    )

    new_old = (
        banded.join(corpus_bands, ["band", "bucket"])
        .join(corpus_sh, "_old_id")
        .select(
            F.col("_new_id").alias("id"),
            F.col("_old_id").alias("partner"),
            F.lit(0).alias("p_new"),
            F.size(F.array_intersect("_new_sh", "_old_sh"))
            .cast("long")
            .alias("inter_n"),
            F.size(F.array_union("_new_sh", "_old_sh"))
            .cast("long")
            .alias("union_n"),
        )
    )

    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("partner", T.LongType()),
            T.StructField("inter_n", T.LongType()),
            T.StructField("union_n", T.LongType()),
        ]
    )
    state_schema = T.StructType([T.StructField("members", T.StringType())])

    def pair_fn(key, pdfs, state: GroupState):
        members: list[tuple[int, list[str]]]
        if state.exists:
            members = [
                (int(i), sh) for i, sh in _json.loads(state.get[0])
            ]
        else:
            members = []
        rows_in = []
        for pdf in pdfs:
            for i, sh in zip(pdf["_new_id"], pdf["_new_sh"]):
                rows_in.append((int(i), list(sh)))
        rows_in.sort(key=lambda t: t[0])
        out = []
        changed, capped = _pair_bucket(members, rows_in, out)
        if capped:
            # Cap hit: arrivals above still flagged against the held
            # members, but not retained as future partners (bounded
            # state, bounded recall loss — executor log, once per
            # bucket per batch).
            import logging as _logging

            _logging.getLogger(__name__).warning(
                "stream_incremental_near_dups bucket %s at "
                "max_bucket_members=%d: new arrivals flag against "
                "held members but are not retained; fold the "
                "increment into the corpus index to reset state",
                tuple(key),
                max_bucket_members,
            )
        # Only re-encode state when membership actually changed — a
        # hot capped bucket must not re-serialize its blob per batch
        # (ADVICE r8).
        if changed:
            state.update((_json.dumps(members),))
        if out:
            yield pd.DataFrame(
                out, columns=["id", "partner", "inter_n", "union_n"]
            )

    def _pair_bucket(members, rows_in, out):
        """The per-(band, bucket) pairing shared verbatim by the
        per-group and bucketed state functions: rows_in ascending by
        id, each arrival pairs against every held member, then joins
        the member list unless the cap holds it out.  Returns
        (changed, capped)."""
        changed = False
        capped = False
        for nid, nsh in rows_in:
            nset = set(nsh)
            for mid, msh in members:
                a = set(msh)
                out.append(
                    (
                        max(nid, mid),
                        min(nid, mid),
                        len(nset & a),
                        len(nset | a),
                    )
                )
            if (
                max_bucket_members is None
                or len(members) < max_bucket_members
            ):
                members.append((nid, nsh))
                changed = True
            else:
                capped = True
        return changed, capped

    def pair_fn_bucketed(key, pdfs, state: GroupState):
        # state = one JSON object "band:bucket" -> members for every
        # logical bucket hashed into this physical bucket; the pairing
        # per logical bucket is _pair_bucket, identical to the
        # per-group path.
        buckets: dict[str, list]
        if state.exists:
            buckets = {
                bk: [(int(i), sh) for i, sh in mem]
                for bk, mem in _json.loads(state.get[0]).items()
            }
        else:
            buckets = {}
        per_bucket: dict[str, list[tuple[int, list[str]]]] = {}
        for pdf in pdfs:
            for b, k, i, sh in zip(
                pdf["band"], pdf["bucket"], pdf["_new_id"], pdf["_new_sh"]
            ):
                per_bucket.setdefault(f"{int(b)}:{int(k)}", []).append(
                    (int(i), list(sh))
                )
        out = []
        changed = False
        capped_keys = []
        for bk, rows_in in per_bucket.items():
            rows_in.sort(key=lambda t: t[0])
            members = buckets.setdefault(bk, [])
            ch, capped = _pair_bucket(members, rows_in, out)
            changed = changed or ch
            if capped:
                capped_keys.append(bk)
        if capped_keys:
            import logging as _logging

            _logging.getLogger(__name__).warning(
                "stream_incremental_near_dups buckets %s at "
                "max_bucket_members=%d: new arrivals flag against "
                "held members but are not retained; fold the "
                "increment into the corpus index to reset state",
                capped_keys,
                max_bucket_members,
            )
        if changed:
            state.update((_json.dumps(buckets),))
        if out:
            yield pd.DataFrame(
                out, columns=["id", "partner", "inter_n", "union_n"]
            )

    if key_buckets is not None:
        grouped = banded.withColumn(
            "_kb",
            F.pmod(
                F.xxhash64(F.col("band"), F.col("bucket")),
                F.lit(int(key_buckets)),
            ),
        ).groupBy("_kb")
        state_fn = pair_fn_bucketed
    else:
        grouped = banded.groupBy("band", "bucket")
        state_fn = pair_fn
    new_new = grouped.applyInPandasWithState(
        state_fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    ).select(
        "id", "partner", F.lit(1).alias("p_new"), "inter_n", "union_n"
    )
    return new_old.unionByName(new_new)


def reduce_incremental_pairs(
    pairs: DataFrame, threshold: float = 0.5, id_col: str = "doc_id"
) -> DataFrame:
    """Batch epilogue for :func:`stream_incremental_near_dups`'
    materialized pair stream: dedupe cross-bucket candidate repeats,
    verify with the engine-side rounded Jaccard (exact integer
    inputs), and reduce to the FIRST PRECEDING PARTNER per flagged
    doc — min over (p_new, partner), i.e. corpus partners before
    streamed ones, then ascending id, the same precedence the batch
    incremental_near_dups (and its oracle) uses."""
    verified = (
        pairs.distinct()
        .withColumn(
            "jaccard",
            F.round(
                F.when(
                    F.col("union_n") > 0,
                    F.col("inter_n").cast("double") / F.col("union_n"),
                ).otherwise(F.lit(0.0)),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    best = F.min(
        F.struct(F.col("p_new"), F.col("partner"), F.col("jaccard"))
    ).alias("_best")
    return (
        verified.groupBy("id")
        .agg(best)
        .select(
            F.col("id").alias(id_col),
            F.col("_best.partner").alias("dup_of"),
            F.col("_best.jaccard").alias("jaccard"),
        )
    )


def stream_exact_substring_flags(
    stream_docs: DataFrame,
    corpus_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 30,
    w: int = 12,
    max_df: int = 50,
    hash_fn=None,
) -> DataFrame:
    """Streaming exact-substring flagging against a static corpus —
    the winnowing twin of :func:`stream_near_dup_flags`: each
    streamed document's winnow fingerprints (pure Column exprs,
    stateless) join the corpus's precomputed fingerprint index; a doc
    sharing any exact substring of length >= k + w - 1 with a corpus
    doc is flagged with its minimum-id partner and the shared
    surviving-fingerprint count for that partner.

    The corpus-side stop-gram filter (``max_df`` over CORPUS document
    frequency) applies before the join, so boilerplate fingerprints
    never enter the stream-static exchange — the occupancy bound is
    static-side and precomputable at index build time.

    Returns the stateless APPEND candidate stream (id, partner) — one
    row per (streamed doc, corpus doc, shared fingerprint); reduce the
    materialized stream with :func:`reduce_substring_flags` (two
    chained aggregations are not allowed inside one streaming query,
    the same split the incremental dedup pair stream uses).
    """
    from ..datapipe import dedup as ddp

    from ..session import iter_checkpoint
    from ..datapipe.dedup import _ensure_parallelism

    # Winnow the corpus ONCE (checkpointed before the df aggregate
    # and the semi-join both consume it — the dsir/winnow-pairs
    # double-eval lesson), then filter to surviving fingerprints.
    corpus_fps = iter_checkpoint(
        ddp.attach_winnow_fingerprints(
            _ensure_parallelism(
                corpus_docs.select(F.col(id_col), F.col(text_col))
            ),
            [id_col],
            text_col,
            k=k,
            w=w,
            hash_fn=hash_fn,
            out="_fps",
        ).select(F.col(id_col).alias("_old_id"), F.explode("_fps").alias("fp"))
    )
    good = (
        corpus_fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("_df"))
        .where(F.col("_df") <= max_df)
        .select("fp")
    )
    corpus_index = corpus_fps.join(good, "fp", "left_semi")

    s_fps = ddp.attach_winnow_fingerprints(
        stream_docs.select(F.col(id_col), F.col(text_col)),
        [id_col],
        text_col,
        k=k,
        w=w,
        hash_fn=hash_fn,
        out="_fps",
    ).select(F.col(id_col).alias("_new_id"), F.explode("_fps").alias("fp"))
    return s_fps.join(corpus_index, "fp").select(
        F.col("_new_id").alias("id"), F.col("_old_id").alias("partner")
    )


def reduce_substring_flags(
    cands: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Batch epilogue for :func:`stream_exact_substring_flags`'
    materialized candidate stream: per flagged doc, the minimum
    corpus partner and the shared-fingerprint count for THAT partner.
    Output: (id, dup_of, n_shared)."""
    per_pair = cands.groupBy("id", "partner").agg(
        F.count(F.lit(1)).alias("_n")
    )
    best = F.min(F.struct(F.col("partner"), F.col("_n"))).alias("_best")
    return (
        per_pair.groupBy("id")
        .agg(best)
        .select(
            F.col("id").alias(id_col),
            F.col("_best.partner").alias("dup_of"),
            F.col("_best._n").alias("n_shared"),
        )
    )


# Process-wide cache of the constructed Gopher signal Column, keyed
# by text column.  Building the battery's Column tree costs ~3 s of
# py4j round trips (the expression is huge); the tree is an immutable
# unresolved expression, so one instance serves every gate/query in
# the process (the _r10_gate_cols precedent — VERDICT r10 #3).
_GOPHER_SIG_COLS: dict = {}


def _gopher_sig_col(text_col: str):
    if text_col not in _GOPHER_SIG_COLS:
        from ..datapipe.quality_rules import gopher_signals

        _GOPHER_SIG_COLS[text_col] = gopher_signals(F.col(text_col))
    return _GOPHER_SIG_COLS[text_col]


def stream_gopher_gate(
    stream_docs: DataFrame,
    text_col: str = "text",
    **thresholds: float,
) -> DataFrame:
    """The full Gopher A1.1 rule battery as a curation-on-ingest
    gate (the heavyweight sibling of :func:`stream_quality_gate`):
    per streamed document every repetition/formatting signal
    (datapipe.quality_rules.gopher_signals) plus the threshold
    verdict — still pure Column expressions, so the gate stays
    STATELESS (append mode, no watermark, no state store) and costs
    one narrow map per micro-batch; micro-batch boundaries cannot
    change any row, so a batch frame replays it exactly (the oracle
    discipline).  ``thresholds`` override gopher_filter's canonical
    cutoffs.

    Output: the input columns plus the flattened signal battery and
    ``passes``.

    Plan-size discipline (VERDICT r10 #3/#4): the signal Column is
    built once per process (``_gopher_sig_col``) and ``passes`` reads
    the MATERIALIZED ``g`` struct column — field references, not a
    second copy of the signal tree — so the per-micro-batch
    optimizer/planner walks one battery expression, not two.
    """
    from ..datapipe.quality_rules import gopher_filter

    return (
        stream_docs.where(F.length(F.trim(F.col(text_col))) > 0)
        .withColumn("g", _gopher_sig_col(text_col))
        .withColumn("passes", gopher_filter(F.col("g"), **thresholds))
        .select("*", "g.*")
        .drop("g")
    )


def stream_quality_gate(
    stream_docs: DataFrame,
    text_col: str = "text",
    min_quality: float = 0.7,
) -> DataFrame:
    """Curation-on-ingest quality gate: per streamed document the
    composite quality heuristic (datapipe.text.quality_score), the
    PII audit counts (datapipe.curate.pii_counts), and the pass/fail
    decision (quality >= ``min_quality`` AND zero PII hits) — all
    pure Column expressions, so the gate is STATELESS (append mode,
    no watermark, no state store) and costs one codegen map per
    micro-batch.  Empty documents are dropped (no signal).

    This is the cheap front gate a 100 TB ingest runs before anything
    expensive (dedup indexes, embeddings) sees the text; route
    ``passed`` rows onward and the rest to the reject/audit sink.
    Works identically on batch frames (the oracle replays it)."""
    from ..datapipe.curate import pii_counts
    from ..datapipe.text import quality_score

    return (
        stream_docs.where(F.length(F.trim(F.col(text_col))) > 0)
        .withColumn("quality", quality_score(F.col(text_col)))
        .withColumn("_pii", pii_counts(F.col(text_col)))
        .withColumn(
            "n_pii",
            (F.col("_pii.n_emails") + F.col("_pii.n_phones")).cast("long"),
        )
        .withColumn(
            "passed",
            (F.col("quality") >= F.lit(min_quality))
            & (F.col("n_pii") == 0),
        )
        .drop("_pii")
    )


def stream_ewma(
    stream: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    alpha: float,
    out_col: str = "ewma",
    key_buckets: int | None = None,
) -> DataFrame:
    """STREAMING per-key EWMA — the telemetry-smoothing recurrence
    ``y_0 = x_0``, ``y_i = alpha*x_i + (1-alpha)*y_{i-1}`` carried
    across micro-batches (VERDICT r15 next #5): the canonical
    ``applyInPandasWithState`` use, where the whole cross-batch state
    is two numbers per key (the last smoothed value + a seen flag).

    Semantics contract: the recurrence consumes each key's rows in
    ``order_cols`` order WITHIN a micro-batch (sorted inside the
    state function — shuffle order never leaks into the result), and
    in ARRIVAL order across batches; it equals the batch
    :func:`~cdp_spark.datapipe.analytics.ewma` exactly when the
    source delivers each key's rows in non-decreasing ``order_cols``
    order across batches (the normal telemetry regime — per-device
    readings arrive in time order).  Out-of-order cross-batch
    arrivals smooth in arrival order, the standard streaming-EWMA
    behavior.

    The recurrence is the explicit ``a*x + (1-a)*y`` form for the
    same bitwise-reproducibility reasons as the batch operator (with
    (1-alpha) exactly representable the stream equals the batch and
    any IEEE oracle bit-for-bit).  State is bounded by key
    cardinality — two doubles per key, never corpus-sized; no
    timeout (a key's baseline persists for its next reading).

    ``key_buckets`` (optimization r17, guide §4): with very many keys
    and a handful of rows per key per trigger, per-KEY grouping pays
    one Python call + pandas frame per key per batch — pure call
    overhead.  Pass a bucket count to group by
    ``pmod(xxhash64(key), key_buckets)`` instead and run the SAME
    per-key recurrence inside the bucket (rows sorted by (key,
    order_cols); cross-batch state is a per-bucket MAP key -> prev,
    null keys carried in a separate slot because Spark maps forbid
    null keys).  Bit-identical output — pinned by test — at
    O(key_buckets) Python calls per trigger instead of O(keys);
    measured 15.4s -> 8.8s on the 100k-row / ~15k-user driver stream
    at 64 buckets.

    Output: the input columns + ``out_col``, append mode."""
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    cols = list(stream.columns)
    a = float(alpha)
    one_minus = 1.0 - a

    if key_buckets is not None:
        kt = stream.schema[key_col].dataType
        int_key = isinstance(
            kt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
        )
        bucketed = stream.withColumn(
            "_kb", F.pmod(F.xxhash64(F.col(key_col)), F.lit(int(key_buckets)))
        )
        cols_b = list(bucketed.columns)
        out_schema_b = T.StructType(
            list(bucketed.schema.fields) + [T.StructField(out_col, T.DoubleType())]
        )
        state_schema_b = T.StructType(
            [
                T.StructField("m", T.MapType(kt, T.DoubleType())),
                T.StructField("null_prev", T.DoubleType()),
                T.StructField("null_seen", T.BooleanType()),
            ]
        )

        def _fn_bucket(key, pdfs, state: GroupState):
            import numpy as np

            if state.exists:
                m_raw, null_prev, null_seen = state.get
                m = dict(m_raw or {})
            else:
                m, null_prev, null_seen = {}, 0.0, False
            chunks = [pdf for pdf in pdfs if len(pdf)]
            if not chunks:
                return
            pdf = (
                pd.concat(chunks, ignore_index=True)
                if len(chunks) > 1
                else chunks[0]
            )
            # sort by (key, order): each key's rows form one contiguous
            # run consumed in order_cols order — the per-key semantics
            pdf = pdf.sort_values([key_col] + order_cols, kind="mergesort")
            vals = pdf[value_col].to_numpy(dtype=np.float64)
            kser = pdf[key_col]
            isna = kser.isna().to_numpy()
            keys = kser.to_numpy()
            out = np.empty_like(vals)
            n = len(vals)
            start = 0
            for i in range(1, n + 1):
                if (
                    i < n
                    and isna[i] == isna[i - 1]
                    and (isna[i] or keys[i] == keys[i - 1])
                ):
                    continue
                if isna[start]:
                    prev, seen = null_prev, null_seen
                else:
                    k = keys[start]
                    k = k.item() if hasattr(k, "item") else k
                    if int_key and not isinstance(k, int):
                        # a batch containing nulls arrives with the key
                        # column coerced to float64; the state map's
                        # declared key type is integral, and float keys
                        # silently fail the map round trip (exact for
                        # |key| < 2^53, the pandas-nullable limit)
                        k = int(k)
                    if k in m:
                        prev, seen = m[k], True
                    else:
                        prev, seen = 0.0, False
                for j in range(start, i):
                    prev = a * vals[j] + one_minus * prev if seen else vals[j]
                    seen = True
                    out[j] = prev
                if isna[start]:
                    null_prev, null_seen = float(prev), True
                else:
                    m[k] = float(prev)
                start = i
            state.update((m, float(null_prev), bool(null_seen)))
            pdf[out_col] = out
            yield pdf[cols_b + [out_col]]

        return (
            bucketed.groupBy("_kb")
            .applyInPandasWithState(
                _fn_bucket,
                outputStructType=out_schema_b,
                stateStructType=state_schema_b,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
            .drop("_kb")
        )

    out_schema = T.StructType(
        list(stream.schema.fields)
        + [T.StructField(out_col, T.DoubleType())]
    )
    state_schema = T.StructType(
        [
            T.StructField("prev", T.DoubleType()),
            T.StructField("seen", T.BooleanType()),
        ]
    )

    def _fn(key, pdfs, state: GroupState):
        import numpy as np

        prev, seen = (state.get if state.exists else (0.0, False))
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            return
        pdf = (
            pd.concat(chunks, ignore_index=True)
            if len(chunks) > 1
            else chunks[0]
        )
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        vals = pdf[value_col].to_numpy(dtype=np.float64)
        out = np.empty_like(vals)
        for i in range(len(vals)):
            prev = (
                a * vals[i] + one_minus * prev if seen else vals[i]
            )
            seen = True
            out[i] = prev
        state.update((float(prev), True))
        pdf[out_col] = out
        yield pdf[cols + [out_col]]

    return stream.groupBy(key_col).applyInPandasWithState(
        _fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_holt(
    stream: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    alpha: float = 0.5,
    beta: float = 0.5,
    key_buckets: int | None = None,
) -> DataFrame:
    """STREAMING per-key Holt double exponential smoothing — the
    two-state (level, trend) recurrence of
    :func:`~cdp_spark.datapipe.analytics.holt` carried across
    micro-batches: ``l_1 = x_1, b_1 = 0``;
    ``l_i = alpha*x_i + (1-alpha)*(l + b)``,
    ``b_i = beta*(l_i - l) + (1-beta)*b`` — trend-aware smoothing
    where :func:`stream_ewma` systematically lags a ramp.

    Same contract as stream_ewma: rows consume in ``order_cols``
    order WITHIN a batch (sorted in the state function) and arrival
    order ACROSS batches, equal to the batch operator whenever each
    key's rows arrive in non-decreasing order across batches.  State
    per key is three numbers (level, trend, seen) — bounded by key
    cardinality, no timeout.  The arithmetic repeats the batch
    operator's exact parenthesisation, so with exactly-representable
    complements the stream, the batch operator, and a recursive-CTE
    oracle agree bit-for-bit.

    ``key_buckets``: same bucketed-state option as
    :func:`stream_ewma` (one Python call per bucket per trigger
    instead of per key; per-bucket map key -> (level, trend), null
    keys in a separate slot; bit-identical output, pinned by test)."""
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    cols = list(stream.columns)
    a = float(alpha)
    one_minus_a = 1.0 - a
    be = float(beta)
    one_minus_b = 1.0 - be

    if key_buckets is not None:
        kt = stream.schema[key_col].dataType
        int_key = isinstance(
            kt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
        )
        bucketed = stream.withColumn(
            "_kb", F.pmod(F.xxhash64(F.col(key_col)), F.lit(int(key_buckets)))
        )
        cols_b = list(bucketed.columns)
        out_schema_b = T.StructType(
            list(bucketed.schema.fields)
            + [T.StructField("level", T.DoubleType()),
               T.StructField("trend", T.DoubleType())]
        )
        state_schema_b = T.StructType(
            [
                T.StructField("m", T.MapType(kt, T.ArrayType(T.DoubleType()))),
                T.StructField("null_lt", T.ArrayType(T.DoubleType())),
            ]
        )

        def _fn_bucket(key, pdfs, state: GroupState):
            import numpy as np

            if state.exists:
                m_raw, null_lt = state.get
                m = {k: (v[0], v[1]) for k, v in dict(m_raw or {}).items()}
            else:
                m, null_lt = {}, None
            null_state = (
                (null_lt[0], null_lt[1]) if null_lt is not None else None
            )
            chunks = [pdf for pdf in pdfs if len(pdf)]
            if not chunks:
                return
            pdf = (
                pd.concat(chunks, ignore_index=True)
                if len(chunks) > 1
                else chunks[0]
            )
            pdf = pdf.sort_values([key_col] + order_cols, kind="mergesort")
            vals = pdf[value_col].to_numpy(dtype=np.float64)
            kser = pdf[key_col]
            isna = kser.isna().to_numpy()
            keys = kser.to_numpy()
            lev = np.empty_like(vals)
            tre = np.empty_like(vals)
            n = len(vals)
            start = 0
            for i in range(1, n + 1):
                if (
                    i < n
                    and isna[i] == isna[i - 1]
                    and (isna[i] or keys[i] == keys[i - 1])
                ):
                    continue
                if isna[start]:
                    prior = null_state
                else:
                    k = keys[start]
                    k = k.item() if hasattr(k, "item") else k
                    if int_key and not isinstance(k, int):
                        # float64-coerced integral key (null-bearing
                        # batch): restore the exact int for the map
                        k = int(k)
                    prior = m.get(k)
                if prior is None:
                    l_prev, b_prev, seen = 0.0, 0.0, False
                else:
                    l_prev, b_prev, seen = prior[0], prior[1], True
                for j in range(start, i):
                    if not seen:
                        l_new = vals[j]
                        b_new = 0.0
                        seen = True
                    else:
                        l_new = a * vals[j] + one_minus_a * (l_prev + b_prev)
                        b_new = be * (l_new - l_prev) + one_minus_b * b_prev
                    lev[j] = l_new
                    tre[j] = b_new
                    l_prev, b_prev = l_new, b_new
                if isna[start]:
                    null_state = (float(l_prev), float(b_prev))
                else:
                    m[k] = (float(l_prev), float(b_prev))
                start = i
            state.update(
                (
                    {k: [v[0], v[1]] for k, v in m.items()},
                    list(null_state) if null_state is not None else None,
                )
            )
            pdf["level"] = lev
            pdf["trend"] = tre
            yield pdf[cols_b + ["level", "trend"]]

        return (
            bucketed.groupBy("_kb")
            .applyInPandasWithState(
                _fn_bucket,
                outputStructType=out_schema_b,
                stateStructType=state_schema_b,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
            .drop("_kb")
        )

    out_schema = T.StructType(
        list(stream.schema.fields)
        + [T.StructField("level", T.DoubleType()),
           T.StructField("trend", T.DoubleType())]
    )
    state_schema = T.StructType(
        [
            T.StructField("level", T.DoubleType()),
            T.StructField("trend", T.DoubleType()),
            T.StructField("seen", T.BooleanType()),
        ]
    )

    def _fn(key, pdfs, state: GroupState):
        import numpy as np

        l_prev, b_prev, seen = (
            state.get if state.exists else (0.0, 0.0, False)
        )
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            return
        pdf = (
            pd.concat(chunks, ignore_index=True)
            if len(chunks) > 1
            else chunks[0]
        )
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        vals = pdf[value_col].to_numpy(dtype=np.float64)
        lev = np.empty_like(vals)
        tre = np.empty_like(vals)
        for i in range(len(vals)):
            if not seen:
                l_new = vals[i]
                b_new = 0.0
                seen = True
            else:
                l_new = a * vals[i] + one_minus_a * (l_prev + b_prev)
                b_new = be * (l_new - l_prev) + one_minus_b * b_prev
            lev[i] = l_new
            tre[i] = b_new
            l_prev, b_prev = l_new, b_new
        state.update((float(l_prev), float(b_prev), True))
        pdf["level"] = lev
        pdf["trend"] = tre
        yield pdf[cols + ["level", "trend"]]

    return stream.groupBy(key_col).applyInPandasWithState(
        _fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
