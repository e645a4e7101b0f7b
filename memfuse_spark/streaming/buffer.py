"""Streaming buffer semantics (SURVEY.md §2.10 B1-B4, §3.3).

The reference hand-rolls a streaming pipeline: RoundBuffer accumulates
message batches per session and flushes on token/size/session triggers
(memfuse `buffer/round_buffer.py:78-163`), HybridBuffer chunks+embeds and
flushes to stores (`buffer/hybrid_buffer.py:27-360`), FlushManager runs
async workers (`buffer/flush_manager.py`), QueryBuffer unions un-flushed
rows with storage for read-your-writes (`buffer/query_buffer.py:331-389`).

Spark-first mapping:
- B1 RoundBuffer  → ``applyInPandasWithState`` keyed by session. Token
  (800) / size (5) / oversize triggers are per-key state transitions; the
  reference's "session changed" trigger is an artifact of its single
  serial buffer — per-key state makes it unnecessary (each session has
  its own buffer), which is also the only shape that scales: state is
  sharded across executors by key.
- B2/B3 Hybrid+FlushManager → ``foreachBatch``: chunk → embed → append
  all sinks inside one exactly-once micro-batch function; Spark's own
  micro-batch machinery replaces the worker pool.
- B4 read-your-writes → union of the un-flushed (stream) table with the
  persisted table, buffer rows winning on id collision.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MAX_TOKENS = 800  # config/buffer/default.yaml:27-29
MAX_SIZE = 5

FLUSH_SCHEMA = StructType(
    [
        StructField("session_id", StringType()),
        StructField("flush_seq", IntegerType()),
        StructField("content", StringType()),
        StructField("message_ids", ArrayType(StringType())),
        StructField("n_messages", IntegerType()),
        StructField("token_count", IntegerType()),
        StructField("trigger", StringType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("contents", ArrayType(StringType())),
        StructField("ids", ArrayType(StringType())),
        StructField("tokens", IntegerType()),
        StructField("flush_seq", IntegerType()),
    ]
)


def _round_buffer_fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: Any) -> Iterator[pd.DataFrame]:
    """Per-session buffer state machine (reference round_buffer.py:78-163):

    - oversized message (alone > MAX_TOKENS): current buffer flushes,
      the message passes straight through as its own flush (:116-129)
    - token trigger: flush BEFORE adding when the running count would
      exceed MAX_TOKENS (:134-138)
    - size trigger: flush AFTER adding when count reaches MAX_SIZE (:141-145)
    Buffered leftovers stay in state across micro-batches.
    """
    session_id = key[0]
    if state.exists:
        contents, ids, tokens, flush_seq = state.get
        contents, ids = list(contents), list(ids)
    else:
        contents, ids, tokens, flush_seq = [], [], 0, 0

    out = []

    def flush(trigger: str) -> None:
        nonlocal contents, ids, tokens, flush_seq
        if not contents:
            return
        out.append(
            (
                session_id,
                flush_seq,
                "\n\n".join(contents),
                list(ids),
                len(contents),
                tokens,
                trigger,
            )
        )
        contents, ids, tokens = [], [], 0
        flush_seq += 1

    # A key's micro-batch data may arrive as MULTIPLE pandas chunks;
    # sorting each chunk independently would process rows out of global
    # sequence order (wrong flush grouping). Concatenate, then sort once.
    chunks = list(pdfs)
    batch = (
        pd.concat(chunks, ignore_index=True).sort_values(
            ["sequence_number"], kind="mergesort"
        )
        if chunks
        else pd.DataFrame()
    )
    if len(batch):
        for _, r in batch.iterrows():
            mtok = int(r["token_count"])
            if mtok > MAX_TOKENS:
                flush("pre_oversize")
                contents, ids, tokens = [str(r["content"])], [str(r["message_id"])], mtok
                flush("oversize")
                continue
            if tokens + mtok > MAX_TOKENS:
                flush("tokens")
            contents.append(str(r["content"]))
            ids.append(str(r["message_id"]))
            tokens += mtok
            if len(contents) >= MAX_SIZE:
                flush("size")

    state.update((contents, ids, tokens, flush_seq))
    if out:
        yield pd.DataFrame(out, columns=[f.name for f in FLUSH_SCHEMA.fields])


def round_buffer_stream(messages: DataFrame) -> DataFrame:
    """Apply the B1 round-buffer to a *streaming* messages DataFrame
    keyed by session_id. Input columns: session_id, message_id,
    sequence_number, content, token_count."""
    return messages.groupBy("session_id").applyInPandasWithState(
        _round_buffer_fn,
        FLUSH_SCHEMA,
        STATE_SCHEMA,
        "append",
        "NoTimeout",
    )


def write_hierarchy_epoch(batch: DataFrame, epoch_id: int, out_base: str) -> None:
    """Write one micro-batch's M0/M1/M2 fan-out, idempotently per epoch:
    output is partitioned by ``epoch_id`` and written with dynamic
    partition overwrite, so replaying an epoch REPLACES its partition
    instead of double-appending."""
    from memfuse_spark.operators import hierarchy as h

    if batch.isEmpty():
        return

    def write_epoch(df: DataFrame, name: str) -> None:
        (
            df.withColumn("epoch_id", F.lit(epoch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch_id")
            .parquet(os.path.join(out_base, name))
        )

    m0 = h.m0_from_events(batch)
    write_epoch(m0, "m0")
    m1 = h.m1_from_m0(m0)
    write_epoch(m1, "m1")
    m2 = h.m2_facts_from_m1(m1)
    write_epoch(m2, "m2")


def ingest_stream(
    events_stream: DataFrame,
    out_base: str,
    trigger_seconds: int | None = None,
) -> "StreamingQuery":
    """B2/B9 micro-batch ingest: each batch writes M0, M1 chunks and M2
    facts in one exactly-once ``foreachBatch`` (the reference's parallel
    layer fan-out, hierarchy/parallel_manager.py:93-360 — Spark writes
    the three tables from one batch closure).

    Exactly-once: output is PARTITIONED BY epoch_id and written with
    dynamic partition overwrite, so a retried epoch (checkpoint replay
    after a crash mid-batch) REPLACES its own partition instead of
    double-appending — idempotent without relying on the checkpoint
    alone. Readers just scan the table; `epoch_id` is metadata.
    """
    def write_batch(batch: DataFrame, epoch_id: int) -> None:
        write_hierarchy_epoch(batch, epoch_id, out_base)

    writer = events_stream.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", os.path.join(out_base, "_checkpoint")
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_your_writes(
    persisted: DataFrame, unflushed: DataFrame, id_col: str = "message_id"
) -> DataFrame:
    """B4/§3.4: union of storage and the un-flushed buffer, buffer rows
    winning on id collision (priority 0 beats 1), as one lazy view."""
    from memfuse_spark.operators.fusion import dedup_by_priority

    buf = unflushed.withColumn("source_priority", F.lit(0))
    store = persisted.withColumn("source_priority", F.lit(1))
    merged = buf.unionByName(store)
    # dedup_by_priority needs a score column; rank purely by priority
    if "score" not in merged.columns:
        merged = merged.withColumn("score", F.lit(0.0))
        return dedup_by_priority(merged, id_col=id_col).drop("score")
    return dedup_by_priority(merged, id_col=id_col)


def speculative_prefetch(
    corpus: DataFrame,
    recent_ids: list,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    score_decimals: int = 6,
) -> DataFrame:
    """B5 SpeculativeBuffer prediction (reference buffer/
    speculative_buffer.py:43-199 — a PLACEHOLDER there; this implements
    its declared ``semantic_similarity`` strategy): the prefetch
    context is the mean embedding of the recent items (summed in id
    order so the float fold is deterministic), and the prefetch set is
    the top-k most similar corpus items excluding the recent ones.

    Plan shape: the context is a 1-row aggregate broadcast into the
    corpus scan; the result is TakeOrderedAndProject — no corpus
    shuffle, same scale envelope as similarity_topk.

    ``dim`` is accepted for API compatibility and ignored — the context
    expression sizes itself from the data.
    """
    n = len(recent_ids)
    recent = corpus.filter(F.col(id_col).isin(list(recent_ids)))
    arr = F.array_sort(
        F.collect_list(F.struct(F.col(id_col).alias("i"), F.col(vec_col).alias("v")))
    )
    ctx_df = recent.agg(arr.alias("__a"))

    from memfuse_spark.functions.vector import dot, l2_norm

    # Mean context as ONE constant-size expression: transform over the
    # dimension indices, summing the n recent vectors left-to-right in
    # id order (deterministic float fold, same order as the oracle).
    # Dynamic element indexing keeps the expression tree O(n) regardless
    # of dim — a per-dimension tree made query CONSTRUCTION (driver-side
    # py4j + analysis) the dominant cost at dim=64 — and removes the
    # need for a dim probe job. Materialized with its norm on the 1-row
    # side BEFORE the join (Spark does not CSE).
    def term(j: int):
        return F.element_at(F.col("__a"), j + 1)["v"]

    def mean_elem(i):
        expr = term(0)[i]
        for j in range(1, n):
            expr = expr + term(j)[i]
        return expr / F.lit(float(n))

    ctx = F.transform(F.sequence(F.lit(0), F.size(term(0)) - 1), mean_elem)
    ctx_df = ctx_df.select(ctx.alias("__ctx")).select(
        "__ctx", l2_norm("__ctx").alias("__ctxn")
    )

    scored = corpus.filter(~F.col(id_col).isin(list(recent_ids))).crossJoin(
        F.broadcast(ctx_df)
    )
    # identical operation tree to functions.vector.cosine_similarity
    # (try_divide + coalesce zero-guard) — bit-identical scores, but the
    # context side's fold ran once on the 1-row table, so each corpus
    # row evaluates exactly 2 interpreted folds (dot + own norm).
    score = F.round(
        F.coalesce(
            F.try_divide(
                dot(F.col(vec_col), F.col("__ctx")),
                l2_norm(F.col(vec_col)) * F.col("__ctxn"),
            ),
            F.lit(0.0),
        ),
        score_decimals,
    )
    return (
        scored.select(id_col, score.alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


class SpeculativeCache:
    """B5 cache bookkeeping around :func:`speculative_prefetch`
    (reference speculative_buffer.py interface: update / get_prefetched
    / stats with hit tracking; max_size + context_window semantics)."""

    def __init__(self, corpus: DataFrame, max_size: int = 10, context_window: int = 3):
        self.corpus = corpus
        self.max_size = max_size
        self.context_window = context_window
        self._recent: list = []
        self._cache: dict = {}
        self.total_hits = 0
        self.total_misses = 0

    def update(self, recent_ids: list) -> None:
        """Record recent accesses and refresh the prefetch cache from
        the last `context_window` of them."""
        self._recent = (self._recent + list(recent_ids))[-self.context_window :]
        rows = speculative_prefetch(
            self.corpus, self._recent, k=self.max_size
        ).collect()
        self._cache = {r[0]: r[1] for r in rows}

    def get(self, item_id):
        if item_id in self._cache:
            self.total_hits += 1
            return self._cache[item_id]
        self.total_misses += 1
        return None

    def stats(self) -> dict:
        total = self.total_hits + self.total_misses
        return {
            "cache_size": len(self._cache),
            "max_size": self.max_size,
            "context_window": self.context_window,
            "total_hits": self.total_hits,
            "total_misses": self.total_misses,
            "hit_rate_percent": round(100.0 * self.total_hits / total, 2)
            if total
            else 0.0,
        }


def stream_dedup(
    events_stream: DataFrame,
    id_cols: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup: duplicate keys arriving within the
    watermark horizon are dropped (dropDuplicatesWithinWatermark), and —
    unlike a plain dropDuplicates on a stream — the dedup state is
    EVICTED once the watermark passes, so state size is bounded by the
    duplicate-arrival window rather than the whole stream history. The
    streaming twin of dedup.exact_dedup for at-least-once sources
    (e.g. Kafka redeliveries)."""
    return events_stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        id_cols or ["event_id"]
    )


def windowed_event_counts(
    events_stream: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked event-time windowed aggregation (late data handled by
    the watermark; the reference has no event-time semantics — this is
    the Spark-native upgrade, SURVEY.md §2.10)."""
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(win, "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
    )


def dedup_ingest_stream(
    docs_stream: DataFrame,
    out_base: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float | None = None,
) -> "StreamingQuery":
    """Streaming incremental near-dup: each micro-batch dedups against
    the accumulated LSH signature index, then absorbs into it.

    The streaming twin of dedup.incremental_neardup_pairs (the
    daily-crawl shape, continuous): per epoch the NEW docs are
    shingled/signed/banded; candidates come from the batch×index
    equi-join plus within-batch; verified pairs, the batch's index rows
    and the batch's docs all land under ``out_base`` partitioned by
    epoch_id with dynamic overwrite — a replayed epoch REPLACES its
    partitions, so the index never double-counts a batch (the same
    exactly-once pattern as ingest_stream). The historical corpus is
    only ever touched as (a) its index rows in the candidate equi-join
    and (b) shingle rehydration for the candidate ids — never
    re-signed.

    Outputs under out_base: ``pairs/`` (doc_a, doc_b, jaccard),
    ``index/`` (doc_id, band, bucket), ``docs/`` (raw batch rows).
    """
    from memfuse_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        incremental_neardup_pairs,
    )

    thr = JACCARD_THRESHOLD if threshold is None else threshold
    spark = docs_stream.sparkSession

    def write_epoch(df: DataFrame, name: str, epoch_id: int) -> None:
        (
            df.withColumn("epoch_id", F.lit(epoch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch_id")
            .parquet(os.path.join(out_base, name))
        )

    def _load(name: str, schema: str) -> DataFrame:
        path = os.path.join(out_base, name)
        try:
            return spark.read.parquet(path)
        except Exception:  # first epoch: nothing written yet
            return spark.createDataFrame([], schema)

    def process_batch(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        index = _load("index", f"{id_col} long, band int, bucket string, epoch_id long")
        prior_docs = _load(
            "docs", f"{id_col} long, {text_col} string, epoch_id long"
        ).filter(F.col("epoch_id") != epoch_id)  # replay: exclude own partition
        all_docs = prior_docs.select(id_col, text_col).unionByName(
            batch.select(id_col, text_col)
        )
        pairs, new_rows = incremental_neardup_pairs(
            batch,
            all_docs,
            index.filter(F.col("epoch_id") != epoch_id).select(
                id_col, "band", "bucket"
            ),
            id_col=id_col,
            text_col=text_col,
            threshold=thr,
        )
        write_epoch(pairs, "pairs", epoch_id)
        write_epoch(new_rows, "index", epoch_id)
        write_epoch(batch.select(id_col, text_col), "docs", epoch_id)

    return (
        docs_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", os.path.join(out_base, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )


def index_ingest_stream(
    docs_stream: DataFrame,
    out_base: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "StreamingQuery":
    """Streaming maintenance of the inverted index — the live-service
    twin of keyword.build_postings_index_v2/update_postings_index_v2.

    Per micro-batch, THREE associative partials land as epoch_id
    partitions with dynamic overwrite (a replayed epoch replaces its
    own partitions — the exactly-once pattern every sink here uses):
    the batch's postings rows, its per-term df partial, and its
    (n_docs, avgdl) stats partial. Because document frequency and
    corpus stats are MERGEABLE (keyed sum / weighted mean), nothing
    historical is ever rewritten — unlike the batch updater, which
    rewrites the O(vocab) side tables per append. Query-time merge is
    keyword.bm25_topk_from_stream_index: filter postings to the query
    terms, sum the df partials, recombine stats.

    Outputs under out_base: ``postings/``, ``dfparts/``, ``statsparts/``.
    """
    def process_batch(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        write_index_epoch(batch, out_base, epoch_id, id_col, text_col)

    return (
        docs_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", os.path.join(out_base, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )


def write_index_epoch(
    batch: DataFrame,
    out_base: str,
    epoch_id: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """One epoch's index partials (shared by the stream above and its
    batch twin): postings + df partial + stats partial, each under an
    epoch_id partition with dynamic overwrite (replay-safe)."""
    from memfuse_spark.operators.keyword import (
        build_postings,
        corpus_stats,
        document_frequency,
    )

    postings = build_postings(batch, id_col, text_col)
    for name, df in (
        ("postings", postings),
        ("dfparts", document_frequency(postings)),
        ("statsparts", corpus_stats(postings)),
    ):
        (
            df.withColumn("epoch_id", F.lit(epoch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch_id")
            .parquet(os.path.join(out_base, name))
        )


def write_vector_epoch(
    batch: DataFrame,
    out_base: str,
    epoch_id: int,
    dim: int,
    num_planes: int = 8,
    vec_col: str = "embedding",
) -> None:
    """One epoch of vector-store ingest (shared by the stream below and
    its batch twin): rows land under (epoch_id, bucket) partitions with
    dynamic overwrite — bucket derivation is the same plan-time LSH as
    ann.write_bucketed_corpus, so a replayed epoch rewrites exactly its
    own partitions and query-time bucket pruning still applies (bucket
    is a partition column regardless of the epoch level above it)."""
    from memfuse_spark.operators.ann import lsh_bucket

    (
        batch.withColumn("bucket", lsh_bucket(vec_col, dim, num_planes))
        .withColumn("epoch_id", F.lit(epoch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("epoch_id", "bucket")
        .parquet(os.path.join(out_base, "vectors"))
    )


def vector_ingest_stream(
    vec_stream: DataFrame,
    out_base: str,
    dim: int,
    num_planes: int = 8,
    vec_col: str = "embedding",
) -> "StreamingQuery":
    """Streaming maintenance of the LSH-bucketed vector store — the
    vector-side twin of index_ingest_stream. Per micro-batch the new
    vectors land under (epoch_id, bucket) partitions (dynamic
    overwrite: replay-safe); the store is queryable at any time with
    bucket partition pruning (ann.bucketed topk shape). Nothing
    historical is ever rewritten."""

    def process_batch(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        write_vector_epoch(batch, out_base, epoch_id, dim, num_planes, vec_col)

    return (
        vec_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", os.path.join(out_base, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )


def conflict_ingest_stream(
    facts_stream: DataFrame,
    out_base: str,
    detector=None,
) -> "StreamingQuery":
    """Streaming insert-time fact conflict detection: each micro-batch
    of M2 facts is checked against the accumulated fact store, then
    absorbed into it — the continuous form of the reference's
    per-write conflict pass (hierarchy/conflict_detection.py:85-108,
    triggered from the write path memory_layer_impl.py:191).

    Per epoch: conflicts = fact_conflicts_between(prior store, batch)
    — epoch order IS temporal order, so the within-conversation
    batch_id comparison is not re-required — and both the conflict
    rows and the batch's facts land under ``out_base`` partitioned by
    epoch_id with dynamic overwrite: a replayed epoch REPLACES its own
    partitions (prior state read excludes them), the same exactly-once
    contract as ingest_stream / dedup_ingest_stream.

    Outputs under out_base: ``conflicts/`` (the fact_conflicts shape +
    epoch_id), ``facts/`` (the accumulated store).

    ``detector=``: the same LLM plug point as the batch kernel
    (``fact_conflicts_between(detector=)``) — e.g.
    ``prompts.llm_detector(provider)``, which rides the real
    prompt-build → call → parse contract per candidate pair. The
    default keeps the deterministic rule tier.
    """
    from memfuse_spark.operators.conflicts import fact_conflicts_between

    spark = facts_stream.sparkSession
    fact_schema = (
        "chunk_id string, conversation_id string, fact_content string, "
        "entities array<string>, confidence double, epoch_id long"
    )

    def write_epoch(df: DataFrame, name: str, epoch_id: int) -> None:
        (
            df.withColumn("epoch_id", F.lit(epoch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch_id")
            .parquet(os.path.join(out_base, name))
        )

    def process_batch(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        try:
            prior = spark.read.parquet(os.path.join(out_base, "facts"))
        except Exception:  # first epoch: nothing written yet
            prior = spark.createDataFrame([], fact_schema)
        prior = prior.filter(F.col("epoch_id") != epoch_id).drop("epoch_id")
        # vs the store, plus within-batch (earlier chunks of the same
        # write batch are "existing" by the time later ones insert —
        # batch_id order supplies the within-epoch temporal order)
        conflicts = fact_conflicts_between(
            prior, batch, detector=detector
        ).unionByName(
            fact_conflicts_between(
                batch, batch, require_batch_order=True, detector=detector
            )
        )
        write_epoch(conflicts, "conflicts", epoch_id)
        write_epoch(batch, "facts", epoch_id)

    return (
        facts_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", os.path.join(out_base, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
