"""Session-gap / watermark constants shared by the streaming operators,
their batch twins, and every oracle that re-derives the same sessions in
SQL. These thresholds appear in four places that MUST agree (streaming
plan, batch plan, Spark-side comparison, DuckDB oracle) — a tweak to a
duplicated literal desynchronizes engine and oracle silently, so all of
them interpolate from here.
"""

# Inactivity gap that closes a session (F.session_window gap duration).
SESSION_GAP_SECONDS = 1800
SESSION_GAP_US = SESSION_GAP_SECONDS * 1_000_000
SESSION_GAP_INTERVAL = f"{SESSION_GAP_SECONDS // 60} minutes"

# Late-data watermark for every streaming operator on the events stream.
WATERMARK_SECONDS = 7200
WATERMARK_MS = WATERMARK_SECONDS * 1000
WATERMARK_INTERVAL = f"{WATERMARK_SECONDS // 3600} hours"

# Stream-stream join attribution lookback (click -> purchase).
ATTRIBUTION_SECONDS = 3600
ATTRIBUTION_INTERVAL = f"{ATTRIBUTION_SECONDS // 3600} hour"


# ---------------------------------------------------------------------------
# r16 drain infrastructure (guide SS1.2 "measure where the time goes",
# SS6). Profiling the bounded drains showed their busy time is NOT the
# stateful computation but state-store COMMIT machinery multiplied by
# partition count and fsync latency:
#
# - Every stateful operator commits one delta file per state partition
#   per microbatch (the outer join holds four stores per partition), so
#   a session default of 32 shuffle partitions costs 128 fsync-bound
#   commits per batch for megabytes of fixture state. Listener metrics
#   on this box: summed commit time 464 s in one 0-input-row batch.
# - The drains' checkpoints and source-chunk scaffolding are DISPOSABLE
#   (every drain deletes them right after termination), but they were
#   landing on the root ext4 volume where one fsync costs ~7 ms.
#
# Both knobs below are scale-dependent settings, parameterized per the
# optimization-round contract: local defaults sized to the fixture
# drains, production values via env.
# ---------------------------------------------------------------------------

import os as _os
import tempfile as _tempfile
from contextlib import contextmanager as _contextmanager

# State/shuffle partition count for the bounded drains. Stateful-
# operator partition counts should be sized to STATE VOLUME (the same
# rule the incremental-dedup batch writer applies to output files),
# not inherited from the batch session's core-count default: the
# fixture drains hold single-digit MB of state, where 8 partitions
# already over-provisions. At production stream volumes set
# SPARK_GRAFT_STREAM_SHUFFLE to match throughput (hundreds+); the
# value is locked into each checkpoint at first batch, and these
# drains create a fresh checkpoint per call, so re-tuning is safe.
DRAIN_SHUFFLE_PARTITIONS = _os.environ.get("SPARK_GRAFT_STREAM_SHUFFLE", "8")


@_contextmanager
def drain_shuffle(spark):
    """Scope ``spark.sql.shuffle.partitions`` to a bounded drain (set
    before ``start()``, restored after termination — microbatches plan
    against the session conf while the drain runs, so the scope must
    cover awaitTermination). Drains run sequentially in the bench and
    tests; concurrent batch work inside the scope would plan at the
    drain width, which affects no result (exact aggregates/joins)."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", DRAIN_SHUFFLE_PARTITIONS)
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def stream_scratch_dir(prefix: str) -> str:
    """mkdtemp for bounded-drain scaffolding (source chunks,
    checkpoints, verdict files). Prefers a RAM-backed base (/dev/shm,
    override with SPARK_GRAFT_STREAM_SCRATCH) because the scaffolding
    is deleted by the drain itself and its durability buys nothing,
    while the state-store commit path fsyncs per partition per batch
    (~7 ms each on this box's ext4, ~0.01 ms on shm). Production
    checkpoints belong on durable shared storage — point
    SPARK_GRAFT_STREAM_SCRATCH there (or at any disk path) to restore
    the previous behavior."""
    base = _os.environ.get("SPARK_GRAFT_STREAM_SCRATCH")
    if base is None:
        shm = "/dev/shm"
        if _os.path.isdir(shm) and _os.access(shm, _os.W_OK):
            base = _os.path.join(shm, "sparrow-stream-scratch")
    if base:
        try:
            _os.makedirs(base, exist_ok=True)
            return _tempfile.mkdtemp(prefix=prefix, dir=base)
        except OSError:
            pass
    return _tempfile.mkdtemp(prefix=prefix)
