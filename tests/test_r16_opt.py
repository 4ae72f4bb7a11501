"""Focused tests for the r16 optimization-round internal changes.

Each optimization that changed an operator's internals gets a direct
equivalence pin here (on top of the DuckDB oracles, which cover the
end-to-end values):

- the EWMA grouped-map worker's numpy fold (small-group branch) must be
  BITWISE identical to the pandas ewm C fold (hot-key branch), which is
  itself the pre-r16 implementation;
- local_df must plan as a JVM LocalRelation (no Python-RDD scan on
  re-execution) while producing exactly the rows/schema of the
  list-of-tuples createDataFrame it replaces;
- the golden-record / keeper struct-aggregate elections must reproduce
  the rank-1-window tie-breaks they replaced;
- the fused multimodal encode->decode worker must equal composing the
  two stage workers;
- drain_shuffle must scope and restore spark.sql.shuffle.partitions,
  and stream_scratch_dir must honor SPARK_GRAFT_STREAM_SCRATCH.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F


def test_ewma_worker_branches_bitwise_identical():
    from sparrow_spark.plans.timeseries import _ewma_worker

    rng = np.random.RandomState(7)
    n = 6000  # > hot threshold: exercises the pandas ewm branch
    pdf_big = pd.DataFrame(
        {
            "user_id": np.full(n, 42, dtype=np.int64),
            "event_id": rng.permutation(n).astype(np.int64),
            "ts": rng.permutation(n).astype(np.int64),
            "value": rng.randn(n),
        }
    )
    pdf_big.loc[pdf_big.index[::97], "value"] = None
    big = _ewma_worker(0.1)(pdf_big.copy())

    # Reference: the exact pre-r16 implementation (sort_values + ewm).
    ref = pdf_big.sort_values(["ts", "event_id"])
    ref_vs = ref["value"].fillna(0.0).astype("float64")
    ref_acc = ref_vs.ewm(alpha=0.1, adjust=False).mean().iloc[-1]
    assert big["ewma"].iloc[0] == ref_acc  # bitwise
    assert int(big["n_events"].iloc[0]) == n

    # Small-group branch (Python loop) against the same ewm fold.
    pdf_small = pdf_big.iloc[:300]
    small = _ewma_worker(0.1)(pdf_small.copy())
    ref_s = pdf_small.sort_values(["ts", "event_id"])
    ref_s_vs = ref_s["value"].fillna(0.0).astype("float64")
    ref_s_acc = ref_s_vs.ewm(alpha=0.1, adjust=False).mean().iloc[-1]
    assert small["ewma"].iloc[0] == ref_s_acc  # bitwise


def test_local_df_is_jvm_local_relation(spark):
    from sparrow_spark.sources import local_df

    rows = [(1, 2.5, "x", True), (2, None, None, False)]
    ddl = "a bigint, b double, c string, d boolean"
    new = local_df(spark, rows, ddl)
    old = spark.createDataFrame(rows, ddl)
    assert new.schema == old.schema
    assert sorted(map(tuple, new.collect())) == sorted(
        map(tuple, old.collect())
    )
    plan = new._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" not in plan  # the Python-RDD scan is gone
    # Empty input keeps the declared shape.
    empty = local_df(spark, [], "a bigint, b string")
    assert empty.schema == spark.createDataFrame([], "a bigint, b string").schema
    assert empty.count() == 0


def test_struct_agg_election_matches_rank1_window(spark):
    # golden-record rep: max(struct(n_chars, doc_id)) == ORDER BY
    # n_chars DESC, doc_id DESC rank 1 — including the all-ties case.
    rows = [
        (1, 10, 100, "en"),
        (1, 10, 101, "de"),  # n_chars tie -> higher doc_id wins
        (1, 9, 102, "de"),
        (2, 5, 200, "fr"),
        (2, 5, 201, "fr"),
        (2, 5, 202, "en"),  # lang counts: fr=2, en=1 -> fr modal
    ]
    df = spark.createDataFrame(
        rows, "cluster_id bigint, n_chars bigint, doc_id bigint, lang string"
    )
    rep = (
        df.groupBy("cluster_id")
        .agg(
            F.max(
                F.struct(
                    F.col("n_chars").alias("n_chars"),
                    F.col("doc_id").alias("doc_id"),
                )
            ).alias("r")
        )
        .select("cluster_id", "r.doc_id")
    )
    got = {r[0]: r[1] for r in rep.collect()}
    assert got == {1: 101, 2: 202}

    modal = (
        df.groupBy("cluster_id", "lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("cluster_id")
        .agg(
            F.min(
                F.struct((-F.col("cnt")).alias("neg"), F.col("lang"))
            ).alias("m")
        )
        .select("cluster_id", "m.lang")
    )
    got_m = {r[0]: r[1] for r in modal.collect()}
    # cluster 1: en=1, de=2 -> de; cluster 2: fr=2, en=1 -> fr
    assert got_m == {1: "de", 2: "fr"}

    # keeper election: min(struct(-q, q, id)) == ORDER BY q DESC, id
    # ASC rank 1, with q == 0.0 exercising the -0.0 comparison path.
    kq = spark.createDataFrame(
        [(1, 0.5, 10), (1, 0.5, 11), (2, 0.0, 20), (2, 0.0, 21)],
        "label bigint, q double, id bigint",
    )
    sel = (
        kq.groupBy("label")
        .agg(
            F.min(
                F.struct(
                    (-F.col("q")).alias("ord"),
                    F.col("q").alias("q"),
                    F.col("id").alias("id"),
                )
            ).alias("k")
        )
        .select("label", "k.id", "k.q")
    )
    got_k = {r[0]: (r[1], r[2]) for r in sel.collect()}
    assert got_k == {1: (10, 0.5), 2: (20, 0.0)}
    # the rounded-q output must not resurface as -0.0
    assert str(got_k[2][1]) == "0.0"


def test_multimodal_fused_worker_equals_two_stage():
    from sparrow_spark.operators.multimodal import (
        decode_image_batches,
        encode_image_batches,
    )

    pdf = pd.DataFrame(
        {"doc_id": [1, 2, 3, 4], "n_chars": [123, 456, 77, 300]}
    )
    enc1, dec1 = encode_image_batches(), decode_image_batches()
    two_stage = pd.concat(dec1(enc1(iter([pdf.copy()]))), ignore_index=True)
    enc2, dec2 = encode_image_batches(), decode_image_batches()
    fused = pd.concat(
        dec2(enc2(iter([pdf.copy()]))), ignore_index=True
    )
    pd.testing.assert_frame_equal(two_stage, fused)
    assert list(two_stage.columns) == [
        "doc_id", "fmt", "width", "height", "pix_sum", "wchecksum",
    ]


def test_drain_shuffle_scopes_and_restores(spark):
    from sparrow_spark.streaming.constants import (
        DRAIN_SHUFFLE_PARTITIONS,
        drain_shuffle,
    )

    before = spark.conf.get("spark.sql.shuffle.partitions")
    with drain_shuffle(spark):
        assert (
            spark.conf.get("spark.sql.shuffle.partitions")
            == DRAIN_SHUFFLE_PARTITIONS
        )
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    # restored even when the drain body raises
    with pytest.raises(RuntimeError):
        with drain_shuffle(spark):
            raise RuntimeError("boom")
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_stream_scratch_dir_honors_env(tmp_path, monkeypatch):
    from sparrow_spark.streaming.constants import stream_scratch_dir

    monkeypatch.setenv("SPARK_GRAFT_STREAM_SCRATCH", str(tmp_path))
    d = stream_scratch_dir("unit_")
    assert os.path.isdir(d)
    assert os.path.dirname(d) == str(tmp_path)
    monkeypatch.delenv("SPARK_GRAFT_STREAM_SCRATCH")
    d2 = stream_scratch_dir("unit_")
    assert os.path.isdir(d2)


def test_zipimport_mtime_guard_semantics(tmp_path):
    """The worker-daemon patch must (a) skip the zip-directory re-read
    when the archive is unchanged, (b) still pick up a genuinely
    replaced archive (fresh mtime -> re-read), preserving stock
    invalidate_caches semantics for the only case that matters."""
    import time
    import zipfile
    import zipimport

    from sparrow_spark.worker_daemon import install_zipimport_mtime_guard

    install_zipimport_mtime_guard()
    # idempotent: double install keeps a single guard layer
    install_zipimport_mtime_guard()
    assert getattr(
        zipimport.zipimporter.invalidate_caches, "_sparrow_mtime_guard", False
    )

    zpath = tmp_path / "mod.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        z.writestr("m_one.py", "X = 1\n")
    zi = zipimport.zipimporter(str(zpath))
    assert zi.find_spec("m_one") is not None
    assert zi.find_spec("m_two") is None

    # Replace the archive with new content but an UNCHANGED mtime:
    # the guard must skip the re-read (this is the per-task fast path).
    st = os.stat(zpath)
    with zipfile.ZipFile(zpath, "w") as z:
        z.writestr("m_one.py", "X = 1\n")
        z.writestr("m_two.py", "Y = 2\n")
    os.utime(zpath, ns=(st.st_atime_ns, st.st_mtime_ns))
    zi.invalidate_caches()  # records the mtime on first call
    zi.invalidate_caches()  # short-circuits: no re-read
    # Now bump the mtime: the next invalidation must re-read and see
    # the new member.
    os.utime(zpath, ns=(st.st_atime_ns, st.st_mtime_ns + 10**9))
    zi.invalidate_caches()
    assert zi.find_spec("m_two") is not None


def test_worker_daemon_patch_reaches_spark_workers(spark):
    """Every forked Python worker must inherit the daemon's patched
    zipimporter.invalidate_caches — the ~117 ms/task zip-directory
    re-read is the single largest Python-boundary cost this round."""

    def probe(batches):
        import zipimport

        import pandas as pd

        for _ in batches:
            pass
        yield pd.DataFrame(
            {
                "patched": [
                    bool(
                        getattr(
                            zipimport.zipimporter.invalidate_caches,
                            "_sparrow_mtime_guard",
                            False,
                        )
                    )
                ]
            }
        )

    out = (
        spark.range(0, 100, 1, 2)
        .mapInPandas(probe, schema="patched boolean")
        .toPandas()
    )
    assert out["patched"].all()
