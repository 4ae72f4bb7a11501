"""ENGINE=SNAPSHOT versioning: commit log over COW primitives (the
Delta-style design from Armbrust et al., VLDB 2020). Pins the whole
surface: version history per write, time travel (VERSION AS OF),
RESTORE as an append-only new version, VACUUM retention, partitioned
snapshot reads, and the no-empty-commit rule."""

import pytest

from sparrow_spark.engine import SparrowError


def _versions(engine, table):
    rows = engine.sql(f"SHOW VERSIONS FROM {table}").df.collect()
    return [(r.version, r.op, r.n_files) for r in rows]


def test_snapshot_history_and_time_travel(engine):
    engine.sql("CREATE DATABASE IF NOT EXISTS snapdb")
    engine.sql("USE snapdb")
    engine.sql(
        "CREATE TABLE s (id INT, v INT, PRIMARY KEY(id)) ENGINE=SNAPSHOT"
    )
    engine.sql("INSERT INTO s VALUES (1, 10), (2, 20)")
    engine.sql("INSERT INTO s VALUES (3, 30)")
    engine.sql("UPDATE s SET v = 99 WHERE id = 2")
    engine.sql("DELETE FROM s WHERE id = 1")
    hist = _versions(engine, "s")
    assert [h[0] for h in hist] == [0, 1, 2, 3, 4]
    assert hist[0][1] == "create" and hist[0][2] == 0
    assert [h[1] for h in hist[1:]] == ["insert", "insert", "update", "delete"]
    # live state
    live = engine.sql("SELECT id, v FROM s ORDER BY id").df.collect()
    assert [(r.id, r.v) for r in live] == [(2, 99), (3, 30)]
    # time travel to each version
    v1 = engine.sql("SELECT id, v FROM s VERSION AS OF 1 ORDER BY id").df.collect()
    assert [(r.id, r.v) for r in v1] == [(1, 10), (2, 20)]
    v2 = engine.sql("SELECT id, v FROM s VERSION AS OF 2 ORDER BY id").df.collect()
    assert [(r.id, r.v) for r in v2] == [(1, 10), (2, 20), (3, 30)]
    v3 = engine.sql("SELECT id, v FROM s VERSION AS OF 3 ORDER BY id").df.collect()
    assert [(r.id, r.v) for r in v3] == [(1, 10), (2, 99), (3, 30)]
    # a versioned and the live table joinable in one statement
    j = engine.sql(
        "SELECT count(*) AS n FROM s a JOIN s VERSION AS OF 2 b ON a.id = b.id"
    ).df.collect()
    assert j[0].n == 2
    engine.sql("DROP TABLE s")


def test_snapshot_restore_appends_version(engine):
    engine.sql("CREATE DATABASE IF NOT EXISTS snapdb")
    engine.sql("USE snapdb")
    engine.sql("CREATE TABLE r (id INT, PRIMARY KEY(id)) ENGINE=SNAPSHOT")
    engine.sql("INSERT INTO r VALUES (1), (2)")
    engine.sql("DELETE FROM r WHERE id = 2")
    res = engine.sql("RESTORE TABLE r TO VERSION 1")
    assert res.affected_rows == 2
    rows = engine.sql("SELECT id FROM r ORDER BY id").df.collect()
    assert [r.id for r in rows] == [1, 2]
    hist = _versions(engine, "r")
    assert hist[-1][1] == "restore" and hist[-1][0] == 3
    engine.sql("DROP TABLE r")


def test_snapshot_vacuum_retention(engine):
    engine.sql("CREATE DATABASE IF NOT EXISTS snapdb")
    engine.sql("USE snapdb")
    engine.sql("CREATE TABLE vac (id INT, PRIMARY KEY(id)) ENGINE=SNAPSHOT")
    for i in range(3):
        engine.sql(f"INSERT INTO vac VALUES ({i})")
    assert [h[0] for h in _versions(engine, "vac")] == [0, 1, 2, 3]
    engine.sql("VACUUM vac RETAIN 2 VERSIONS")
    assert [h[0] for h in _versions(engine, "vac")] == [2, 3]
    # vacuumed version no longer readable
    with pytest.raises(SparrowError, match="does not exist"):
        engine.sql("SELECT * FROM vac VERSION AS OF 1")
    # retained versions still read
    rows = engine.sql("SELECT id FROM vac VERSION AS OF 2 ORDER BY id").df.collect()
    assert [r.id for r in rows] == [0, 1]
    # live table unaffected
    assert engine.sql("SELECT count(*) AS n FROM vac").df.collect()[0].n == 3
    engine.sql("DROP TABLE vac")


def test_snapshot_partitioned_time_travel(engine):
    engine.sql("CREATE DATABASE IF NOT EXISTS snapdb")
    engine.sql("USE snapdb")
    engine.sql(
        "CREATE TABLE p (id INT, region CHAR, PRIMARY KEY(id)) "
        "ENGINE=SNAPSHOT PARTITIONED BY (region)"
    )
    engine.sql("INSERT INTO p VALUES (1, 'eu'), (2, 'us')")
    engine.sql("DELETE FROM p WHERE region = 'eu'")
    # partition-column values must survive the pool round-trip
    v1 = engine.sql(
        "SELECT id, region FROM p VERSION AS OF 1 ORDER BY id"
    ).df.collect()
    assert [(r.id, r.region) for r in v1] == [(1, "eu"), (2, "us")]
    live = engine.sql("SELECT id, region FROM p ORDER BY id").df.collect()
    assert [(r.id, r.region) for r in live] == [(2, "us")]
    engine.sql("DROP TABLE p")


def test_snapshot_requires_engine_option(engine):
    engine.sql("CREATE DATABASE IF NOT EXISTS snapdb")
    engine.sql("USE snapdb")
    engine.sql("CREATE TABLE plainpq (id INT, PRIMARY KEY(id))")
    engine.sql("INSERT INTO plainpq VALUES (1)")
    for bad in (
        "SHOW VERSIONS FROM plainpq",
        "RESTORE TABLE plainpq TO VERSION 0",
        "VACUUM plainpq",
        "SELECT * FROM plainpq VERSION AS OF 0",
    ):
        with pytest.raises(SparrowError, match="ENGINE=SNAPSHOT"):
            engine.sql(bad)
    engine.sql("DROP TABLE plainpq")


def test_snapshot_no_empty_commits(engine):
    engine.sql("CREATE DATABASE IF NOT EXISTS snapdb")
    engine.sql("USE snapdb")
    engine.sql("CREATE TABLE ne (id INT, PRIMARY KEY(id)) ENGINE=SNAPSHOT")
    engine.sql("INSERT INTO ne VALUES (1)")
    n_before = len(_versions(engine, "ne"))
    # a DELETE matching nothing rewrites no files -> no new version
    engine.sql("DELETE FROM ne WHERE id = 999")
    assert len(_versions(engine, "ne")) == n_before
    engine.sql("DROP TABLE ne")


def _changes(engine, table, a, b):
    rows = engine.sql(
        f"SELECT _commit_version, _change_type, id, v FROM {table} "
        f"CHANGES BETWEEN {a} AND {b} "
        "ORDER BY _commit_version, _change_type, id"
    ).df.collect()
    return [(r._commit_version, r._change_type, r.id, r.v) for r in rows]


def test_snapshot_cdf_full_history(engine):
    engine.sql("CREATE DATABASE IF NOT EXISTS snapdb")
    engine.sql("USE snapdb")
    engine.sql("CREATE TABLE cdf (id INT, v INT, PRIMARY KEY(id)) ENGINE=SNAPSHOT")
    engine.sql("INSERT INTO cdf VALUES (1, 10), (2, 20), (3, 30)")  # v1
    engine.sql("UPDATE cdf SET v = 99 WHERE id = 2")  # v2
    engine.sql("DELETE FROM cdf WHERE id = 3")  # v3
    engine.sql("INSERT INTO cdf VALUES (4, 40)")  # v4
    assert _changes(engine, "cdf", 0, 4) == [
        (1, "insert", 1, 10),
        (1, "insert", 2, 20),
        (1, "insert", 3, 30),
        (2, "update_postimage", 2, 99),
        (2, "update_preimage", 2, 20),
        (3, "delete", 3, 30),
        (4, "insert", 4, 40),
    ]
    # sub-ranges slice the same feed
    assert _changes(engine, "cdf", 1, 2) == [
        (2, "update_postimage", 2, 99),
        (2, "update_preimage", 2, 20),
    ]
    assert _changes(engine, "cdf", 3, 4) == [(4, "insert", 4, 40)]
    # empty step range -> empty feed
    assert _changes(engine, "cdf", 4, 4) == []
    engine.sql("DROP TABLE cdf")


def test_snapshot_cdf_suppresses_unchanged_cow_rewrites(engine):
    """Copy-on-write rewrites whole files, so survivors of an UPDATE
    travel into the new file with unchanged content — the feed must
    carry only the logical change, whatever the physical layout."""
    engine.sql("CREATE DATABASE IF NOT EXISTS snapdb")
    engine.sql("USE snapdb")
    engine.sql("CREATE TABLE cdfs (id INT, v INT, PRIMARY KEY(id)) ENGINE=SNAPSHOT")
    engine.sql("INSERT INTO cdfs VALUES (1, 10), (2, 20), (3, 30), (4, 40)")
    engine.sql("UPDATE cdfs SET v = -1 WHERE id = 1")
    feed = _changes(engine, "cdfs", 1, 2)
    assert feed == [
        (2, "update_postimage", 1, -1),
        (2, "update_preimage", 1, 10),
    ]
    engine.sql("DROP TABLE cdfs")


def test_snapshot_cdf_restore_emits_reverting_changes(engine):
    engine.sql("CREATE DATABASE IF NOT EXISTS snapdb")
    engine.sql("USE snapdb")
    engine.sql("CREATE TABLE cdfr (id INT, v INT, PRIMARY KEY(id)) ENGINE=SNAPSHOT")
    engine.sql("INSERT INTO cdfr VALUES (1, 10)")  # v1
    engine.sql("UPDATE cdfr SET v = 99 WHERE id = 1")  # v2
    engine.sql("RESTORE TABLE cdfr TO VERSION 1")  # v3: 99 -> 10
    assert _changes(engine, "cdfr", 2, 3) == [
        (3, "update_postimage", 1, 10),
        (3, "update_preimage", 1, 99),
    ]
    engine.sql("DROP TABLE cdfr")


def test_snapshot_cdf_validation(engine):
    engine.sql("CREATE DATABASE IF NOT EXISTS snapdb")
    engine.sql("USE snapdb")
    engine.sql("CREATE TABLE cdfv (id INT, v INT, PRIMARY KEY(id)) ENGINE=SNAPSHOT")
    engine.sql("INSERT INTO cdfv VALUES (1, 10)")
    with pytest.raises(SparrowError, match="does not exist"):
        engine.sql("SELECT * FROM cdfv CHANGES BETWEEN 0 AND 7")
    with pytest.raises(SparrowError, match="empty range"):
        engine.sql("SELECT * FROM cdfv CHANGES BETWEEN 1 AND 0")
    engine.sql("CREATE TABLE plaincdf (id INT, PRIMARY KEY(id))")
    with pytest.raises(SparrowError, match="ENGINE=SNAPSHOT"):
        engine.sql("SELECT * FROM plaincdf CHANGES BETWEEN 0 AND 1")
    engine.sql("DROP TABLE cdfv")
    engine.sql("DROP TABLE plaincdf")


def test_snapshot_cdf_partitioned(engine):
    engine.sql("CREATE DATABASE IF NOT EXISTS snapdb")
    engine.sql("USE snapdb")
    engine.sql(
        "CREATE TABLE cdfp (id INT, v INT, region CHAR, PRIMARY KEY(id)) "
        "ENGINE=SNAPSHOT PARTITIONED BY (region)"
    )
    engine.sql("INSERT INTO cdfp VALUES (1, 10, 'eu'), (2, 20, 'us')")  # v1
    engine.sql("DELETE FROM cdfp WHERE region = 'us'")  # v2
    rows = engine.sql(
        "SELECT _commit_version, _change_type, id, v, region FROM cdfp "
        "CHANGES BETWEEN 1 AND 2"
    ).df.collect()
    assert [(r._commit_version, r._change_type, r.id, r.v, r.region) for r in rows] == [
        (2, "delete", 2, 20, "us")
    ]
    engine.sql("DROP TABLE cdfp")


def test_snapshot_optimize_commits_version_with_empty_feed(engine):
    """OPTIMIZE TABLE on a SNAPSHOT table compacts small files into a
    fresh layout — a new commit (the file set changed) whose change
    feed must be EMPTY: pure physical rewrite, zero logical churn.
    This is the property that makes background compaction safe to run
    under live CDF consumers."""
    engine.sql("CREATE DATABASE IF NOT EXISTS snapdb")
    engine.sql("USE snapdb")
    engine.sql("CREATE TABLE opt (id INT, v INT, PRIMARY KEY(id)) ENGINE=SNAPSHOT")
    for i in range(3):  # three commits -> several small files
        engine.sql(f"INSERT INTO opt VALUES ({i}, {i * 10})")
    n_before = len(engine.sql("SHOW VERSIONS FROM opt").df.collect())
    engine.sql("OPTIMIZE TABLE opt")
    hist = engine.sql("SHOW VERSIONS FROM opt").df.collect()
    assert len(hist) == n_before + 1
    last = hist[-1].version
    feed = engine.sql(
        f"SELECT * FROM opt CHANGES BETWEEN {last - 1} AND {last}"
    ).df.collect()
    assert feed == []
    # live rows survive compaction
    rows = engine.sql("SELECT id, v FROM opt ORDER BY id").df.collect()
    assert [(r.id, r.v) for r in rows] == [(0, 0), (1, 10), (2, 20)]
    engine.sql("DROP TABLE opt")


def test_streaming_upsert_into_snapshot_table(engine, spark, sf_dir, tmp_path):
    """The lakehouse loop end-to-end: a file stream drains through
    foreachBatch MERGE upserts into an ENGINE=SNAPSHOT table — each
    applied microbatch commits exactly one version (ledger-absorbed
    replays commit nothing), and replaying the change feed over the
    whole history reconstructs the final serving state. This is the
    streaming ingestion + versioned storage + CDF integration a
    downstream replica would consume."""
    import os

    from pyspark.sql import functions as F

    from sparrow_spark.engine import SparrowError
    from sparrow_spark.sources import load_table
    from sparrow_spark.streaming.engine_upsert import apply_batch

    engine.sql("CREATE DATABASE IF NOT EXISTS snapdb")
    engine.sql("USE snapdb")
    engine.script(
        """CREATE TABLE profiles (user_id BIGINT, n_events BIGINT,
               sum_value DOUBLE, PRIMARY KEY(user_id)) ENGINE=SNAPSHOT;
           CREATE TABLE applied_batches (batch_id INT, PRIMARY KEY(batch_id))"""
    )
    events = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "value")
        .filter(F.col("user_id") <= 50)
    )
    src = str(tmp_path / "src")
    chunks = [
        events.filter(F.col("event_id") % 2 == 0),
        events.filter(F.col("event_id") % 2 == 1),
    ]
    for i, c in enumerate(chunks):
        c.coalesce(1).write.parquet(os.path.join(src, f"chunk-{i:03d}"))
    stream = (
        spark.readStream.schema("event_id bigint, user_id bigint, value double")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda batch, bid: apply_batch(engine, batch, bid)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream drain timed out"
    # replay of batch 0: ledger absorbs it -> NO new snapshot version
    hist_before = engine.sql("SHOW VERSIONS FROM profiles").df.collect()
    apply_batch(engine, spark.read.parquet(os.path.join(src, "chunk-000")), 0)
    hist_after = engine.sql("SHOW VERSIONS FROM profiles").df.collect()
    assert len(hist_after) == len(hist_before)
    # create + one MERGE commit per applied batch
    assert [r.version for r in hist_after] == [0, 1, 2]
    assert [r.op for r in hist_after[1:]] == ["merge", "merge"]
    # CDF replay over the full history == live serving state
    last = hist_after[-1].version
    state = {}
    feed = engine.sql(
        f"SELECT _commit_version AS cv, _change_type AS ct, user_id, n_events, "
        f"sum_value FROM profiles CHANGES BETWEEN 0 AND {last} ORDER BY cv"
    ).df.collect()
    for r in feed:
        if r.ct in ("insert", "update_postimage"):
            state[r.user_id] = (r.n_events, round(r.sum_value, 6))
        elif r.ct == "delete":
            del state[r.user_id]
    live = {
        r.user_id: (r.n_events, round(r.sum_value, 6))
        for r in engine.sql(
            "SELECT user_id, n_events, sum_value FROM profiles"
        ).df.collect()
    }
    assert state == live
    # and the live state equals the plain batch aggregate of the input
    expected = {
        r.user_id: (r.n, round(r.s, 6))
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert live == expected
    engine.sql("DROP TABLE profiles")
    engine.sql("DROP TABLE applied_batches")


def test_snapshot_timestamp_as_of(engine):
    """Time travel by wall clock: TIMESTAMP AS OF resolves to the
    latest version committed at or before the given UTC instant."""
    import datetime
    import time

    engine.sql("CREATE DATABASE IF NOT EXISTS snapdb")
    engine.sql("USE snapdb")
    engine.sql("CREATE TABLE tta (id INT, v INT, PRIMARY KEY(id)) ENGINE=SNAPSHOT")
    engine.sql("INSERT INTO tta VALUES (1, 10)")  # v1
    time.sleep(1.2)
    engine.sql("UPDATE tta SET v = 99 WHERE id = 1")  # v2
    hist = engine.sql("SHOW VERSIONS FROM tta").df.collect()
    # an instant strictly between v1 and v2: committed_at truncates to
    # the second, so trunc(v1)+1.0 >= the real v1 instant (fraction <1)
    # and < the real v2 instant (the 1.2 s sleep) — both bounds hold
    # for ANY sub-second fraction, unlike a +0.9 offset (flaked once).
    t1 = datetime.datetime.strptime(
        hist[1].committed_at, "%Y-%m-%d %H:%M:%S"
    ) + datetime.timedelta(seconds=1.0)
    lit = t1.strftime("%Y-%m-%d %H:%M:%S.%f")
    rows = engine.sql(
        f"SELECT id, v FROM tta TIMESTAMP AS OF '{lit}'"
    ).df.collect()
    assert [(r.id, r.v) for r in rows] == [(1, 10)]
    # after the last commit -> error (Delta parity: a future literal is
    # almost always a typo, and the live state would change under it)
    future = (t1 + datetime.timedelta(hours=1)).strftime("%Y-%m-%d %H:%M:%S")
    with pytest.raises(SparrowError, match="after the latest commit"):
        engine.sql(f"SELECT id, v FROM tta TIMESTAMP AS OF '{future}'")
    # before the table existed -> error
    with pytest.raises(SparrowError, match="at or before"):
        engine.sql("SELECT * FROM tta TIMESTAMP AS OF '1999-01-01'")
    with pytest.raises(SparrowError, match="bad TIMESTAMP"):
        engine.sql("SELECT * FROM tta TIMESTAMP AS OF 'not-a-time'")
    engine.sql("DROP TABLE tta")


def test_snapshot_logical_clock_asof_deterministic(engine):
    """With an injectable logical clock the TIMESTAMP AS OF resolution
    is fully deterministic: commits stamp 1700000000, +60, +120, … so
    each minute boundary picks exactly one version."""
    import datetime

    engine.sql("CREATE DATABASE IF NOT EXISTS snapdb")
    engine.sql("USE snapdb")
    base = 1_700_000_000  # 2023-11-14 22:13:20 UTC
    ticks = iter(range(0, 100))
    engine.snapshot_clock = lambda: base + 60 * next(ticks)
    try:
        engine.sql(
            "CREATE TABLE tlc (id INT, v INT, PRIMARY KEY(id)) ENGINE=SNAPSHOT"
        )  # v0 @ base
        engine.sql("INSERT INTO tlc VALUES (1, 10)")  # v1 @ base+60
        engine.sql("UPDATE tlc SET v = 20 WHERE id = 1")  # v2 @ base+120
    finally:
        engine.snapshot_clock = None

    def lit(off):
        return datetime.datetime.fromtimestamp(
            base + off, datetime.timezone.utc
        ).strftime("%Y-%m-%d %H:%M:%S")

    # between v1 and v2 -> v1; exactly v2 -> v2; after v2 -> error
    rows = engine.sql(
        f"SELECT v FROM tlc TIMESTAMP AS OF '{lit(90)}'"
    ).df.collect()
    assert [r.v for r in rows] == [10]
    rows = engine.sql(
        f"SELECT v FROM tlc TIMESTAMP AS OF '{lit(120)}'"
    ).df.collect()
    assert [r.v for r in rows] == [20]
    with pytest.raises(SparrowError, match="after the latest commit"):
        engine.sql(f"SELECT v FROM tlc TIMESTAMP AS OF '{lit(121)}'")
    engine.sql("DROP TABLE tlc")


def test_time_travel_phrases_inside_string_literals_untouched(engine):
    """The VERSION AS OF / TIMESTAMP AS OF / CHANGES BETWEEN rewrites
    must not fire inside quoted strings or comments — the phrase is
    legitimate DATA (e.g. a log message column)."""
    engine.sql("CREATE DATABASE IF NOT EXISTS snapdb")
    engine.sql("USE snapdb")
    engine.sql(
        "CREATE TABLE tls (id INT, v INT, PRIMARY KEY(id)) ENGINE=SNAPSHOT"
    )
    engine.sql("INSERT INTO tls VALUES (1, 10)")
    rows = engine.sql(
        "SELECT id, 'tls VERSION AS OF 0' AS a, "
        "'tls TIMESTAMP AS OF ''2020-01-01''' AS b, "
        "'from tls CHANGES BETWEEN 0 AND 1' AS c "
        "FROM tls -- tls VERSION AS OF 99"
    ).df.collect()
    assert rows[0].a == "tls VERSION AS OF 0"
    assert rows[0].b == "tls TIMESTAMP AS OF '2020-01-01'"
    assert rows[0].c == "from tls CHANGES BETWEEN 0 AND 1"
    # outside a literal the rewrite still fires in the same statement
    rows = engine.sql(
        "SELECT id, 'x VERSION AS OF 7' AS tag FROM tls VERSION AS OF 1"
    ).df.collect()
    assert [(r.id, r.tag) for r in rows] == [(1, "x VERSION AS OF 7")]
    engine.sql("DROP TABLE tls")


def test_changes_between_rejects_vacuumed_range(engine):
    """CDF over a range with vacuumed interior versions errors (Delta
    table_changes parity) instead of silently lumping the vacuumed
    commit's changes into the next surviving version."""
    engine.sql("CREATE DATABASE IF NOT EXISTS snapdb")
    engine.sql("USE snapdb")
    engine.sql(
        "CREATE TABLE tcv (id INT, v INT, PRIMARY KEY(id)) ENGINE=SNAPSHOT"
    )
    engine.sql("INSERT INTO tcv VALUES (1, 10)")  # v1
    engine.sql("UPDATE tcv SET v = 20 WHERE id = 1")  # v2
    engine.sql("INSERT INTO tcv VALUES (2, 30)")  # v3
    engine.sql("VACUUM tcv RETAIN 2 VERSIONS")  # keeps v2, v3
    # surviving contiguous range still works
    rows = engine.sql(
        "SELECT _change_type AS ct, id FROM tcv CHANGES BETWEEN 2 AND 3"
    ).df.collect()
    assert {(r.ct, r.id) for r in rows} == {("insert", 2)}
    # range spanning the vacuumed v0/v1 errors and names the gap
    with pytest.raises(SparrowError, match=r"\[0, 1\].*does not exist"):
        engine.sql("SELECT * FROM tcv CHANGES BETWEEN 0 AND 3")
    engine.sql("DROP TABLE tcv")


def test_optimize_min_files_policy_composes_with_versions(engine):
    """OPTIMIZE ... MIN FILES k over a SNAPSHOT table: a scheduled
    compaction only rewrites (and therefore only commits a version)
    when the table has actually fragmented past the threshold — an
    already-compact table commits NOTHING, so nightly OPTIMIZE does
    not churn the version history."""
    engine.sql("CREATE DATABASE IF NOT EXISTS snapdb")
    engine.sql("USE snapdb")
    engine.sql(
        "CREATE TABLE omf (id INT, v INT, PRIMARY KEY(id)) ENGINE=SNAPSHOT"
    )
    for i in range(3):
        engine.sql(f"INSERT INTO omf VALUES ({i}, {i})")  # v1..v3
    n_before = len(_versions(engine, "omf"))
    # fragmented (>= 3 files) -> compacts, commits one version
    rows = engine.sql("OPTIMIZE TABLE omf MIN FILES 3").rows()
    assert [(r.Msg_type, r.Msg_text) for r in rows] == [("status", "OK")]
    assert len(_versions(engine, "omf")) == n_before + 1
    assert _versions(engine, "omf")[-1][1] == "optimize"
    # already compact -> skipped, NO new version
    rows = engine.sql("OPTIMIZE TABLE omf MIN FILES 3").rows()
    assert rows[0].Msg_type == "note" and "skipped" in rows[0].Msg_text
    assert len(_versions(engine, "omf")) == n_before + 1
    # default (no MIN FILES) keeps the unconditional rewrite
    rows = engine.sql("OPTIMIZE TABLE omf").rows()
    assert [(r.Msg_type, r.Msg_text) for r in rows] == [("status", "OK")]
    assert len(_versions(engine, "omf")) == n_before + 2
    # rows survive throughout
    got = engine.sql("SELECT id FROM omf ORDER BY id").df.collect()
    assert [r.id for r in got] == [0, 1, 2]
    engine.sql("DROP TABLE omf")


def test_vacuum_dry_run_reports_without_deleting(engine):
    """VACUUM ... DRY RUN lists exactly what a real VACUUM would drop
    (manifests outside the retained window + unreferenced pool files)
    and deletes NOTHING: history still time-travels afterwards, and
    the subsequent real VACUUM removes the same file count."""
    engine.sql("CREATE DATABASE IF NOT EXISTS snapdb")
    engine.sql("USE snapdb")
    engine.sql("CREATE TABLE vdr (id INT, v INT, PRIMARY KEY(id)) ENGINE=SNAPSHOT")
    engine.sql("INSERT INTO vdr VALUES (0, 0)")
    engine.sql("INSERT INTO vdr VALUES (1, 1)")
    # the UPDATE rewrites every file (COW), so the pre-update pool
    # files are referenced ONLY by the to-be-dropped manifests
    engine.sql("UPDATE vdr SET v = v + 10")
    rows = engine.sql("VACUUM vdr RETAIN 1 VERSIONS DRY RUN").df.collect()
    manifests = [r for r in rows if r.kind == "manifest"]
    pool_files = [r for r in rows if r.kind == "pool_file"]
    assert [r.version for r in manifests] == [0, 1, 2]
    assert pool_files and all(r.size_bytes > 0 for r in pool_files)
    # nothing deleted: every version still readable
    assert [h[0] for h in _versions(engine, "vdr")] == [0, 1, 2, 3]
    rows_v1 = engine.sql("SELECT id FROM vdr VERSION AS OF 1").df.collect()
    assert [r.id for r in rows_v1] == [0]
    # the real vacuum removes exactly the dry run's pool-file count
    res = engine.sql("VACUUM vdr RETAIN 1 VERSIONS")
    assert res.affected_rows == len(pool_files)
    assert [h[0] for h in _versions(engine, "vdr")] == [3]
    engine.sql("DROP TABLE vdr")


def test_literal_spans_edge_cases(engine):
    """The rewrite guard's literal/comment scanner on pathological
    inputs: doubled-quote escapes, backslash escapes, unterminated
    strings, and both comment styles — spans must cover the literals
    exactly so a guarded match inside survives and one outside fires."""
    spans = engine._literal_spans
    sql = "SELECT 'a''b', \"c\\\"d\", x -- tail VERSION AS OF 1\nFROM t"
    got = spans(sql)
    covered = [sql[a:b] for a, b in got]
    assert covered[0] == "'a''b'"
    assert covered[1] == '"c\\"d"'
    assert covered[2].startswith("-- tail")
    # block comment + unterminated string both close at end-of-text
    got2 = engine._literal_spans("SELECT /* VERSION AS OF 9 */ 'open")
    texts = ["SELECT /* VERSION AS OF 9 */ 'open"[a:b] for a, b in got2]
    assert texts[0] == "/* VERSION AS OF 9 */"
    assert texts[1] == "'open"


def test_changes_between_huge_bound_errors_fast(engine):
    """A syntactically valid but absurd upper bound (BETWEEN 0 AND
    10^14) must error in O(|versions|) — the validator previously
    iterated the full Python range (and rebuilt set(versions) per
    iteration), hanging the engine — and the gap list in the message
    is truncated."""
    import time

    engine.sql("CREATE DATABASE IF NOT EXISTS snapdb")
    engine.sql("USE snapdb")
    engine.sql(
        "CREATE TABLE thuge (id INT, v INT, PRIMARY KEY(id)) ENGINE=SNAPSHOT"
    )
    engine.sql("INSERT INTO thuge VALUES (1, 10)")  # v1
    t0 = time.time()
    with pytest.raises(SparrowError, match=r"more\).*does not exist"):
        engine.sql("SELECT * FROM thuge CHANGES BETWEEN 0 AND 99999999999999")
    assert time.time() - t0 < 5.0, "range validation is not O(|versions|)"
    # a short gap list is still printed in full, untruncated
    with pytest.raises(SparrowError, match=r"\[2, 3\](?!.*more\)).*does not exist"):
        engine.sql("SELECT * FROM thuge CHANGES BETWEEN 0 AND 3")
    engine.sql("DROP TABLE thuge")
