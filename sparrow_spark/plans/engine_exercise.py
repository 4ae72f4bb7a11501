"""Driver-verifiable exercises of the STATEMENT-level engine surface.

The external correctness driver can only check `(spark, sf_dir) ->
DataFrame` queries, so the engine's DDL/DML/SHOW statements (SURVEY
§2.1 S2-S23) were previously pytest-only. These registered queries
close that gap honestly: each builds a throwaway engine warehouse,
executes a canned statement script through the real Engine.sql path
(the same code the MySQL wire server dispatches to), and returns the
deterministic final state — which a literal-VALUES DuckDB oracle
hash-verifies.

NOTE: unlike every other registered query, plan-build here EXECUTES
statements (that is the point — DML has effects, not plans). The
scripts touch a handful of rows in a /tmp warehouse, never the
fixture corpus, so a cold 1 g driver session builds them in
milliseconds. Kept out of bench.py.
"""

from __future__ import annotations

import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession

from sparrow_spark.registry import query
from sparrow_spark.sources import local_df


def _fresh_engine(spark: SparkSession):
    from sparrow_spark.engine import Engine

    wh = tempfile.mkdtemp(prefix="sparrow-dml-q-")
    eng = Engine(spark, wh)
    schema = f"dmlx_{uuid.uuid4().hex[:8]}"
    # Pre-create the Spark-catalog database with an explicit LOCATION in
    # the throwaway warehouse: a driver session's default warehouse dir
    # (cwd-relative) may not be writable.
    spark.sql(f"CREATE DATABASE IF NOT EXISTS `{schema}` LOCATION '{wh}/sparkdb'")
    eng.script(f"CREATE SCHEMA {schema}; USE {schema}")
    return eng, schema, wh


def _freeze_and_cleanup(
    spark: SparkSession, df: DataFrame, schema: str, wh: str
) -> DataFrame:
    """Materialize the (handful of) result rows into a LocalRelation,
    then drop the throwaway catalog database and rmtree the tempdir
    warehouse. Without this every plan build leaked a /tmp directory
    and a permanent Spark-catalog database (driver/selfcheck runs
    multiply it). The returned DataFrame no longer references the
    warehouse, so the registry's plan cache stays valid after cleanup."""
    rows = df.collect()
    out = local_df(spark, rows, df.schema)
    spark.sql(f"DROP DATABASE IF EXISTS `{schema}` CASCADE")
    shutil.rmtree(wh, ignore_errors=True)
    return out


@query(
    "q_engine_dml",
    oracle="""
    SELECT id, name, CAST(bal AS DOUBLE) AS bal FROM (VALUES
      (1, 'a1', 16.0),
      (2, 'b2', 99.0),
      (4, 'd',  40.0),
      (5, 'e',  50.0),
      (6, 'm',  60.0),
      (7, 'g',  70.0)
    ) t(id, name, bal)
    """,
)
def q_engine_dml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2/S3/S4 + REPLACE + ON DUPLICATE KEY UPDATE + MERGE + prepared
    statements end-to-end: INSERT (append files), UPDATE (file-pruned
    COW), DELETE, REPLACE upsert, ODKU upsert-in-place (r10 — id 1
    takes bal+VALUES(bal) and the incoming name, id 7 inserts), MERGE
    with both arms, binary-path prepared INSERT — then the surviving
    rows, hash-checked against the literal expected state."""
    eng, schema, wh = _fresh_engine(spark)
    eng.script(
        """
        CREATE TABLE accounts (id INT, name CHAR, bal DOUBLE, PRIMARY KEY(id));
        INSERT INTO accounts VALUES (1, 'a', 10.0), (2, 'b', 20.0), (3, 'c', 30.0);
        UPDATE accounts SET bal = bal + 5 WHERE id <= 2;
        DELETE FROM accounts WHERE id = 3;
        REPLACE INTO accounts VALUES (2, 'b2', 99.0);
        MERGE INTO accounts t USING (SELECT 2 AS id, 'x' AS name, 0.0 AS bal
                                     UNION ALL
                                     SELECT 6, 'm', 60.0) s
          ON t.id = s.id
          WHEN MATCHED THEN UPDATE SET bal = t.bal
          WHEN NOT MATCHED THEN INSERT (id, name, bal) VALUES (s.id, s.name, s.bal);
        INSERT INTO accounts VALUES (1, 'a1', 1.0), (7, 'g', 70.0)
          ON DUPLICATE KEY UPDATE bal = bal + VALUES(bal), name = VALUES(name);
        """
    )
    stmt_id, n = eng.prepare("INSERT INTO accounts VALUES (?, ?, ?)")
    assert n == 3
    eng.execute_prepared(stmt_id, [4, "d", 40.0])
    eng.execute_prepared(stmt_id, [5, "e", 50.0])
    eng.close_prepared(stmt_id)
    final = eng.sql("SELECT id, name, bal FROM accounts ORDER BY id").df
    return _freeze_and_cleanup(spark, final, schema, wh)


@query(
    "q_engine_show",
    oracle="""
    SELECT * FROM (VALUES
      ('id',   'int',    'NO',  'PRI'),
      ('name', 'char',   'YES', ''),
      ('bal',  'double', 'YES', '')
    ) t(Field, Type, "Null", Key)
    """,
)
def q_engine_show(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S16 (SHOW COLUMNS) through the real dispatcher, hash-checked
    against the literal MySQL-shaped metadata rows."""
    eng, schema, wh = _fresh_engine(spark)
    eng.sql("CREATE TABLE widgets (id INT PRIMARY KEY, name CHAR, bal DOUBLE)")
    df = eng.sql("SHOW COLUMNS FROM widgets").df
    return _freeze_and_cleanup(
        spark, df.select("Field", "Type", "Null", "Key"), schema, wh
    )


@query(
    "q_engine_partition",
    oracle="""
    SELECT region, id, CAST(val AS DOUBLE) AS val FROM (VALUES
      ('ap', 201, 201.0),
      ('eu', 1,   1.0),
      ('eu', 2,   2.0),
      ('us', 101, 1101.0),
      ('us', 102, 1102.0)
    ) t(region, id, val)
    """,
)
def q_engine_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned-table storage surface end-to-end, driver-verifiable:
    CREATE TABLE ... PARTITIONED BY lays data out in hive-style
    region=<val>/ directories, INSERT routes rows to partition dirs,
    UPDATE/DELETE with a partition predicate rewrite only the matching
    directory's files (file-level COW + partition pruning — the plan
    carries PartitionFilters, asserted in tests), and a predicate-free
    scan reads it all back. Final state hash-checked against the
    literal expected rows."""
    eng, schema, wh = _fresh_engine(spark)
    eng.script(
        """
        CREATE TABLE pev (id INT, region CHAR, val DOUBLE, PRIMARY KEY(id))
          PARTITIONED BY (region);
        INSERT INTO pev VALUES (1, 'eu', 1.0), (2, 'eu', 2.0);
        INSERT INTO pev VALUES (101, 'us', 101.0), (102, 'us', 102.0);
        INSERT INTO pev VALUES (201, 'ap', 201.0), (202, 'ap', 202.0);
        UPDATE pev SET val = val + 1000 WHERE region = 'us';
        DELETE FROM pev WHERE region = 'ap' AND id = 202;
        """
    )
    final = eng.sql(
        "SELECT region, id, val FROM pev ORDER BY region, id"
    ).df
    return _freeze_and_cleanup(spark, final, schema, wh)


@query(
    "q_engine_snapshot",
    oracle="""
    SELECT src, id, val FROM (VALUES
      ('hist', 0, 'create'),
      ('hist', 1, 'insert'),
      ('hist', 2, 'update'),
      ('hist', 3, 'restore'),
      ('live', 1, '10'),
      ('live', 2, '20'),
      ('live', 3, '30'),
      ('asof2', 1, '10'),
      ('asof2', 2, '99'),
      ('asof2', 3, '30')
    ) t(src, id, val)
    ORDER BY src, id
    """,
)
def q_engine_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENGINE=SNAPSHOT versioning end-to-end through the dispatcher
    (the Delta-style commit log over COW primitives, engine.py
    _snapshot_commit): insert/update versions accrue, VERSION AS OF
    reads an immutable historical snapshot from the hard-linked pool,
    and RESTORE rolls the live table back as an append-only new
    version. Output = the version history (id=version, val=op), the
    post-restore live rows, and the AS-OF-2 snapshot — deterministic
    (no file counts: those vary with writer parallelism), hash-checked
    against the literal oracle."""
    from pyspark.sql import functions as F

    eng, schema, wh = _fresh_engine(spark)
    eng.script(
        """
        CREATE TABLE st (id INT, v INT, PRIMARY KEY(id)) ENGINE=SNAPSHOT;
        INSERT INTO st VALUES (1, 10), (2, 20), (3, 30);
        UPDATE st SET v = 99 WHERE id = 2;
        RESTORE TABLE st TO VERSION 1;
        """
    )
    hist = (
        eng.sql("SHOW VERSIONS FROM st")
        .df.select(
            F.lit("hist").alias("src"),
            F.col("version").cast("int").alias("id"),
            F.col("op").alias("val"),
        )
    )
    live = eng.sql(
        "SELECT 'live' AS src, id, CAST(v AS STRING) AS val FROM st"
    ).df
    asof = eng.sql(
        "SELECT 'asof2' AS src, id, CAST(v AS STRING) AS val "
        "FROM st VERSION AS OF 2"
    ).df
    out = hist.unionByName(live).unionByName(asof).orderBy("src", "id")
    return _freeze_and_cleanup(spark, out, schema, wh)


@query(
    "q_engine_snapshot_cdf",
    oracle="""
    SELECT ver, change, id, val FROM (VALUES
      (1, 'insert',           1, 10),
      (1, 'insert',           2, 20),
      (1, 'insert',           3, 30),
      (2, 'update_preimage',  2, 20),
      (2, 'update_postimage', 2, 99),
      (3, 'delete',           3, 30),
      (4, 'insert',           4, 40)
    ) t(ver, change, id, val)
    ORDER BY ver, change, id
    """,
)
def q_engine_snapshot_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change data feed over the ENGINE=SNAPSHOT commit log (engine.py
    _snap_changes — the Delta-CDF-style incremental read): after an
    insert/update/delete/insert script, `SELECT ... FROM t CHANGES
    BETWEEN 0 AND 4` returns every row-level change with its commit
    version and change type. Each version step reads ONLY the files
    that commit added or removed (immutable files cannot contain
    changes), and copy-on-write survivors rewritten with unchanged
    content are suppressed by a null-safe all-column compare — so the
    feed is deterministic whatever the physical file layout, and its
    cost tracks logical churn, not rewrite amplification. Hash-checked
    against the literal expected feed."""
    eng, schema, wh = _fresh_engine(spark)
    eng.script(
        """
        CREATE TABLE cf (id INT, v INT, PRIMARY KEY(id)) ENGINE=SNAPSHOT;
        INSERT INTO cf VALUES (1, 10), (2, 20), (3, 30);
        UPDATE cf SET v = 99 WHERE id = 2;
        DELETE FROM cf WHERE id = 3;
        INSERT INTO cf VALUES (4, 40);
        """
    )
    out = eng.sql(
        "SELECT CAST(_commit_version AS INT) AS ver, _change_type AS change, "
        "id, v AS val FROM cf CHANGES BETWEEN 0 AND 4 "
        "ORDER BY ver, change, id"
    ).df
    return _freeze_and_cleanup(spark, out, schema, wh)


@query(
    "q_engine_snapshot_asof_ts",
    oracle="""
    SELECT src, id, val FROM (VALUES
      ('t1', 1, 10),
      ('t1', 2, 20),
      ('t2', 1, 10),
      ('t2', 2, 99),
      ('t3', 1, 10),
      ('t3', 2, 99),
      ('t3', 3, 30)
    ) t(src, id, val)
    ORDER BY src, id
    """,
)
def q_engine_snapshot_asof_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIMESTAMP AS OF wall-clock time travel, made hash-verifiable by
    the engine's injectable logical clock (engine.snapshot_clock):
    commits stamp base=1700000000 (2023-11-14 22:13:20 UTC), +60 s per
    commit, so each literal below resolves deterministically to the
    latest version committed at or before it — t1 lands between v1 and
    v2 (reads v1), t2 hits v2's exact instant (inclusive), t3 lands
    after v3's commit but is clamped to the last commit via an exact
    literal (a ts past the latest commit errors, Delta parity). The
    wall-clock default path keeps its own pytest
    (test_snapshot_timestamp_as_of)."""
    eng, schema, wh = _fresh_engine(spark)
    base = 1_700_000_000
    ticks = iter(range(100))
    eng.snapshot_clock = lambda: base + 60 * next(ticks)
    try:
        eng.script(
            """
            CREATE TABLE ta (id INT, v INT, PRIMARY KEY(id)) ENGINE=SNAPSHOT;
            INSERT INTO ta VALUES (1, 10), (2, 20);
            UPDATE ta SET v = 99 WHERE id = 2;
            INSERT INTO ta VALUES (3, 30);
            """
        )  # v0 @ 22:13:20, v1 @ 22:14:20, v2 @ 22:15:20, v3 @ 22:16:20
    finally:
        eng.snapshot_clock = None
    reads = [
        ("t1", "2023-11-14 22:14:30"),  # between v1 and v2 -> v1
        ("t2", "2023-11-14 22:15:20"),  # exactly v2 -> v2 (inclusive)
        ("t3", "2023-11-14 22:16:20"),  # exactly v3 (the last commit)
    ]
    out = None
    for src, lit in reads:
        df = eng.sql(
            f"SELECT '{src}' AS src, id, v AS val "
            f"FROM ta TIMESTAMP AS OF '{lit}'"
        ).df
        out = df if out is None else out.unionByName(df)
    return _freeze_and_cleanup(spark, out.orderBy("src", "id"), schema, wh)


@query(
    "q_engine_optimize_zorder",
    oracle="""
    SELECT CAST(200 AS BIGINT) AS n_rows,
           TRUE AS z_monotone,
           TRUE AS pk_order_broken,
           CAST(4900 AS BIGINT) AS sum_x
    """,
)
def q_engine_optimize_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE ... ZORDER BY through the real dispatcher, with the
    PHYSICAL layout verified independently: after compacting 200
    deterministic rows along the (x, y) Morton curve, the single
    output file's rows are re-read in physical order and the
    interleave is recomputed from first principles (min/max range
    buckets, bit interleave — the same arithmetic as
    engine._zorder_sort but re-derived here, not called), asserting
    the z sequence is nondecreasing AND is not the primary-key order
    (so the zorder branch demonstrably took over from the default PK
    sort). Bounded collect: one 200-row file, engine-exercise class.
    Layout determinism: x = (i*7) % 50, y = (i*13) % 50 fixes every
    bucket, and coalesce(1) fixes the file count, so the booleans and
    checksums are constants the literal oracle hash-checks."""
    import os

    eng, schema, wh = _fresh_engine(spark)
    eng.sql("CREATE TABLE zx (id INT, x INT, y INT, PRIMARY KEY(id))")
    vals = ", ".join(
        f"({i}, {(i * 7) % 50}, {(i * 13) % 50})" for i in range(200)
    )
    eng.sql(f"INSERT INTO zx VALUES {vals}")
    eng.sql("OPTIMIZE TABLE zx ZORDER BY (x, y)")
    data_dir = eng.catalog.data_path(schema, "zx")
    files = sorted(
        os.path.join(r, fn)
        for r, _d, fns in os.walk(data_dir)
        for fn in fns
        if fn.endswith(".parquet")
    )
    assert len(files) == 1
    import pyarrow.parquet as pq

    t = pq.read_table(files[0], columns=["id", "x", "y"])
    ids = t.column("id").to_pylist()
    xs, ys = t.column("x").to_pylist(), t.column("y").to_pylist()
    mnx, mxx, mny, mxy = min(xs), max(xs), min(ys), max(ys)
    bits, n, nb = 16, 2, 1 << 16

    def bucket(v, mn, mx):
        return 0 if mx <= mn else min(int((v - mn) / (mx - mn) * nb), nb - 1)

    def z(x, y):
        bx, by = bucket(x, mnx, mxx), bucket(y, mny, mxy)
        return sum(
            (((bx >> b) & 1) << (b * n)) + (((by >> b) & 1) << (b * n + 1))
            for b in range(bits)
        )

    zs = [z(x, y) for x, y in zip(xs, ys)]
    out = local_df(
        spark,
        [
            (
                len(ids),
                zs == sorted(zs),
                ids != sorted(ids),
                sum(xs),
            )
        ],
        "n_rows bigint, z_monotone boolean, pk_order_broken boolean, "
        "sum_x bigint",
    )
    return _freeze_and_cleanup(spark, out, schema, wh)


@query(
    "q_engine_optimize_minfiles",
    oracle="""
    SELECT ver, op FROM (VALUES
      (0, 'create'),
      (1, 'insert'),
      (2, 'insert'),
      (3, 'insert'),
      (4, 'optimize')
    ) t(ver, op)
    ORDER BY ver
    """,
)
def q_engine_optimize_minfiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MIN FILES compaction policy composing with SNAPSHOT version
    history, driver-verifiable end-to-end: three single-row inserts
    fragment the table to >= 3 files, OPTIMIZE MIN FILES 3 compacts
    (committing exactly one 'optimize' version), and a second
    identical OPTIMIZE skips — the table now holds exactly 1 file
    (coalesce(1) fixes the count) — committing NOTHING. The version
    history is therefore a deterministic 5-row constant regardless of
    writer parallelism (file COUNTS never appear in the output, only
    version ids and ops), hash-checked by the literal oracle."""
    from pyspark.sql import functions as F

    eng, schema, wh = _fresh_engine(spark)
    eng.script(
        """
        CREATE TABLE mf (id INT, v INT, PRIMARY KEY(id)) ENGINE=SNAPSHOT;
        INSERT INTO mf VALUES (1, 10);
        INSERT INTO mf VALUES (2, 20);
        INSERT INTO mf VALUES (3, 30);
        OPTIMIZE TABLE mf MIN FILES 3;
        OPTIMIZE TABLE mf MIN FILES 3;
        """
    )
    out = (
        eng.sql("SHOW VERSIONS FROM mf")
        .df.select(
            F.col("version").cast("int").alias("ver"),
            F.col("op"),
        )
        .orderBy("ver")
    )
    return _freeze_and_cleanup(spark, out, schema, wh)


@query(
    "q_engine_rename",
    oracle="""
    SELECT * FROM (VALUES
      (1, 10, 'x', 'id|quantity|note', true),
      (2, 21, 'y', 'id|quantity|note', true),
      (3, 30, 'z', 'id|quantity|note', true),
      (4, 40, 'w', 'id|quantity|note', true)
    ) t(id, quantity, note, cols_fp, old_names_gone)
    """,
)
def q_engine_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RENAME surface through the real dispatcher (superset of S9/
    S10's ALTER forms; reference parity for RENAME TABLE per MySQL 8):
    ALTER TABLE ... RENAME COLUMN (a COW rewrite — parquet embeds
    column names per file, engine.py:779), then ALTER TABLE ... RENAME
    TO, then the multi-pair RENAME TABLE statement. The script proves
    the renamed column stays updatable, data survives both table
    renames, inserts land under the intermediate name, SHOW COLUMNS
    reflects the new column name (cols_fp), and both prior table names
    are really gone (old_names_gone — each must raise, not resolve)."""
    from pyspark.sql import functions as F

    eng, schema, wh = _fresh_engine(spark)
    eng.script(
        """
        CREATE TABLE inv (id INT, qty INT, note CHAR, PRIMARY KEY(id));
        INSERT INTO inv VALUES (1, 10, 'x'), (2, 20, 'y'), (3, 30, 'z');
        ALTER TABLE inv RENAME COLUMN qty TO quantity;
        UPDATE inv SET quantity = quantity + 1 WHERE id = 2;
        ALTER TABLE inv RENAME TO stock;
        INSERT INTO stock VALUES (4, 40, 'w');
        RENAME TABLE stock TO stock2
        """
    )
    cols = [r.Field for r in eng.sql("SHOW COLUMNS FROM stock2").df.collect()]
    gone = 0
    for old_name in ("inv", "stock"):
        try:
            eng.sql(f"SELECT * FROM {old_name}")
        except Exception:
            gone += 1
    df = eng.sql("SELECT id, quantity, note FROM stock2 ORDER BY id").df
    out = df.select(
        "id",
        "quantity",
        "note",
        F.lit("|".join(cols)).alias("cols_fp"),
        F.lit(gone == 2).alias("old_names_gone"),
    )
    return _freeze_and_cleanup(spark, out, schema, wh)
