"""Incremental streaming near-duplicate detection: every arriving
microbatch of documents is checked against the MinHash-LSH band index
of EVERYTHING seen so far, then its own bands are appended to the
index — dedup-at-ingest for a continuously growing corpus, the shape a
production pipeline runs so a new crawl snapshot never reintroduces
known documents.

Built on foreachBatch (the accumulating band index is relational state
— keyed equi-join lookups, parquet-persisted — which fits a table
better than the per-key state store applyInPandasWithState offers).
Per microbatch: one bucket equi-join of batch bands vs the index plus
one within-batch self-join; both are band-bucket joins, never
corpus-wide pairwise. The index grows as O(docs x bands), is
partitionable on band_sig, and at scale would be a Delta/iceberg table
with compaction; batch verdicts append-only.

Ordering contract: a document counts as a duplicate iff it collides
with an EARLIER document (prior microbatch, or smaller doc_id within
its own batch) — so a doc_id-ordered drain reproduces the batch
verdict "collides with any smaller doc_id", which is what the oracle
checks.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparrow_spark.operators.dedup import _MINHASH_BANDS_CTE, minhash_bands
from sparrow_spark.registry import query
from sparrow_spark.sources import load_table
from sparrow_spark.streaming.constants import drain_shuffle, stream_scratch_dir

_BANDS_SCHEMA = "doc_id bigint, band int, band_sig string"


def _batch_subdirs_before(root: str, batch_id: int) -> list[str]:
    """Paths of per-batch subdirectories written by batches < batch_id."""
    if not os.path.isdir(root):
        return []
    out = []
    for d in sorted(os.listdir(root)):
        if d.startswith("batch-"):
            try:
                bid = int(d.split("-", 1)[1])
            except ValueError:
                continue
            if bid < batch_id:
                out.append(os.path.join(root, d))
    return out


def compact_band_index(
    spark: SparkSession, index_dir: str, upto_batch: int
) -> int:
    """Merge the per-batch index subdirectories of batches strictly
    before ``upto_batch`` into one — the periodic small-file
    compaction the append-per-microbatch layout needs (same job as
    OPTIMIZE TABLE, engine.py, and what Delta/Iceberg OPTIMIZE does
    for the at-scale deployment this parquet layout stands in for).

    Rows are repartitioned on band and sorted by (band, band_sig)
    within files, so post-compaction lookups get parquet min/max
    row-group pruning on exactly the join keys. The merged output
    keeps the HIGHEST compacted batch id as its directory name, so
    ``_batch_subdirs_before`` semantics are unchanged for every future
    batch. Only compact batches whose streaming checkpoint is
    committed: a replay of a compacted batch would (correctly) no
    longer find the pre-batch index state — with Delta this whole
    swap is one transaction. Returns the number of subdirectories
    merged (0 = nothing to do)."""
    prior = _batch_subdirs_before(index_dir, upto_batch)
    if len(prior) <= 1:
        return 0
    merged = (
        spark.read.schema(_BANDS_SCHEMA)
        .parquet(*prior)
        # One file per ~fixture; at scale the target tracks index
        # volume (bytes / maxPartitionBytes), not the session default.
        .repartition(1, "band")
        .sortWithinPartitions("band", "band_sig")
    )
    tmp = os.path.join(index_dir, f"_compact-{uuid.uuid4().hex[:8]}")
    merged.write.parquet(tmp)
    last = prior[-1]
    for d in prior:
        shutil.rmtree(d)
    os.rename(tmp, last)
    return len(prior)


def dedup_batch_against_index(
    batch: DataFrame, batch_id: int, index_dir: str, verdict_dir: str
) -> None:
    """foreachBatch callback body: verdict every doc in `batch` against
    the accumulated index + earlier docs of the same batch, then fold
    the batch's bands into the index.

    foreachBatch is at-least-once, so both writes are keyed by
    ``batch_id`` and use overwrite: a replayed batch rewrites its own
    two subdirectories instead of appending duplicate rows. The index
    read is scoped to batches STRICTLY BEFORE this one, so a replay
    whose prior attempt already appended its bands never sees its own
    documents in the index (which would mark the whole batch dup)."""
    spark = batch.sparkSession
    # A file-source microbatch arrives as ONE input split per file —
    # without an explicit repartition the whole minhash computation
    # runs serially in a single task (the same parallelism trap as the
    # Python-tier EWMA: nothing downstream restores parallelism the
    # source never had). Measured 7x on the bands materialization.
    bands = minhash_bands(
        batch.repartition(spark.sparkContext.defaultParallelism)
    ).cache()
    try:
        prior = _batch_subdirs_before(index_dir, batch_id)
        if prior:
            index = spark.read.schema(_BANDS_SCHEMA).parquet(*prior)
        else:
            index = spark.createDataFrame([], _BANDS_SCHEMA)
        # Cross-batch collisions: any index hit marks the batch doc.
        # Join direction matters at scale: the accumulated index is the
        # BIG side and must never shuffle — broadcast the (bounded)
        # microbatch's signature set at it, take the matching
        # signatures (a subset of the batch's, so tiny), and broadcast
        # those back over the batch. The index is scanned once per
        # batch, map-side only. (The first cut distinct()-ed the index
        # per microbatch — a full index shuffle every batch.)
        batch_sigs = bands.select("band", "band_sig").distinct()
        hit_sigs = (
            index.join(F.broadcast(batch_sigs), ["band", "band_sig"], "left_semi")
            .select("band", "band_sig")
            .distinct()
        )
        # Per-doc dedup of hits is deferred to the single distinct()
        # over the union below — distinct-ing each branch separately
        # added two shuffle stages for identical output.
        vs_index = bands.join(
            F.broadcast(hit_sigs), ["band", "band_sig"], "left_semi"
        ).select("doc_id")
        # Within-batch collisions: earlier (smaller id) doc wins. Both
        # sides are the microbatch — broadcast one instead of shuffling.
        a = bands.select(
            F.col("doc_id").alias("a_id"), "band", "band_sig"
        )
        b = bands.select(
            F.col("doc_id").alias("doc_id"), "band", "band_sig"
        )
        within = (
            a.join(F.broadcast(b), ["band", "band_sig"])
            .filter(F.col("a_id") < F.col("doc_id"))
            .select("doc_id")
        )
        dups = vs_index.union(within).distinct()
        verdicts = (
            batch.select("doc_id")
            .join(F.broadcast(dups.withColumn("is_dup", F.lit(1))), "doc_id", "left")
            .select(
                "doc_id", F.coalesce("is_dup", F.lit(0)).cast("bigint").alias("is_dup")
            )
        )
        sub = f"batch-{batch_id:05d}"
        # Size output files to the BATCH, not to shuffle.partitions: a
        # microbatch's verdicts/bands are tiny relative to the cluster
        # default (32 shuffle partitions -> 32 near-empty files + 32
        # task commits per write, which dominated the drain wall time
        # ~10x over the actual hash math). One file per microbatch is
        # the foreachBatch sizing rule; at real scale this coalesce
        # target scales with batch volume, not with the session default.
        verdicts.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(verdict_dir, sub)
        )
        bands.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(index_dir, sub)
        )
    finally:
        bands.unpersist()


def incremental_lsh_dedup_stream(
    spark: SparkSession, src_dir: str, state_root: str
):
    """Attach the incremental dedup to a documents file stream. Returns
    (query, verdict_dir). maxFilesPerTrigger=1 so every source file is
    its own microbatch — the index genuinely accumulates between
    batches."""
    index_dir = os.path.join(state_root, "band_index")
    verdict_dir = os.path.join(state_root, "verdicts")
    docs_schema = (
        "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    stream = (
        spark.readStream.schema(docs_schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src_dir)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda batch, bid: dedup_batch_against_index(
                batch, bid, index_dir, verdict_dir
            )
        )
        .option("checkpointLocation", os.path.join(state_root, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    return q, verdict_dir


@query(
    "q_stream_incremental_dedup",
    oracle=_MINHASH_BANDS_CTE
    + """
    SELECT d.doc_id,
           CAST(coalesce(dup.is_dup, 0) AS BIGINT) AS is_dup
    FROM documents d
    LEFT JOIN (
      SELECT DISTINCT b.doc_id, 1 AS is_dup
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_sig = b.band_sig
       AND a.doc_id < b.doc_id
    ) dup ON d.doc_id = dup.doc_id
    """,
)
def q_stream_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the documents fixture through the incremental dedup in
    three doc_id-ordered microbatches (file mtimes force source order)
    and return every doc's verdict. Because arrival order == doc_id
    order, the streamed verdict must equal the batch rule "collides in
    some LSH band with a smaller doc_id" — which the oracle computes
    directly. Short docs (<3 tokens) have no shingles/bands and are
    never duplicates, matching the batch LSH path."""
    docs = load_table(spark, sf_dir, "documents")
    lo, hi = docs.agg(
        F.expr("percentile(doc_id, 0.33)"), F.expr("percentile(doc_id, 0.66)")
    ).first()
    root = stream_scratch_dir(f"incdedup_{uuid.uuid4().hex[:8]}_")
    src = os.path.join(root, "src")
    chunks = [
        docs.filter(F.col("doc_id") <= lo),
        docs.filter((F.col("doc_id") > lo) & (F.col("doc_id") <= hi)),
        docs.filter(F.col("doc_id") > hi),
    ]
    for i, c in enumerate(chunks):
        d = os.path.join(src, f"chunk-{i:03d}")
        c.coalesce(1).write.parquet(d)
        # The file source orders by modification time; pin strictly
        # increasing mtimes so batch order == doc_id order even when
        # all writes land within one filesystem timestamp tick.
        for f in os.listdir(d):
            os.utime(os.path.join(d, f), (1_700_000_000 + i, 1_700_000_000 + i))
    with drain_shuffle(spark):
        q, verdict_dir = incremental_lsh_dedup_stream(spark, src, root)
        finished = q.awaitTermination(180)
    if not finished:
        q.stop()
        raise RuntimeError(
            "incremental dedup drain did not finish within 180s; "
            "refusing to return a partially-written verdict set"
        )
    # Drain scaffolding (source chunks, checkpoint, band index) is done
    # with; only the verdicts must outlive this call — the returned
    # DataFrame reads them lazily, so the verdict dir is removed at
    # interpreter exit instead of here.
    for sub in ("src", "ckpt", "band_index"):
        shutil.rmtree(os.path.join(root, sub), ignore_errors=True)
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    return spark.read.option("recursiveFileLookup", "true").parquet(verdict_dir)
