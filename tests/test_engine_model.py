"""Model-based DML test: drive the engine with a randomized (seeded)
statement sequence and mirror every operation in a plain Python dict
keyed by primary key. After every statement the table contents must
equal the model exactly — this catches cross-statement interactions
(copy-on-write rewrites clobbering rows, rowid leaks, unique-probe
false positives/negatives) that example-based tests miss. The
reference's own tests are example-based only (SURVEY §5); this is the
exceed-the-reference tier for the engine layer.
"""

import random

import pytest

from sparrow_spark.engine import Engine, SparrowError


@pytest.fixture(scope="module")
def model_engine(spark, tmp_path_factory):
    eng = Engine(spark, warehouse_dir=str(tmp_path_factory.mktemp("model_wh")))
    eng.sql("CREATE DATABASE modeldb")
    eng.sql("USE modeldb")
    return eng


def _table_state(eng):
    rows = eng.sql("SELECT k, v, s FROM mt ORDER BY k").df.collect()
    return {r.k: (r.v, r.s) for r in rows}


def test_randomized_dml_sequence_matches_model(model_engine):
    eng = model_engine
    eng.sql("CREATE TABLE mt (k INT, v FLOAT, s CHAR, PRIMARY KEY(k))")
    model: dict[int, tuple[float, str]] = {}
    rng = random.Random(20260813)

    for step in range(60):
        op = rng.choice(["insert", "insert_dup", "update", "delete", "replace", "merge"])
        k = rng.randrange(12)
        v = round(rng.uniform(0, 100), 2)
        s = rng.choice(["a", "b", "c"])
        if op == "insert":
            if k in model:
                with pytest.raises(SparrowError, match="Duplicate entry"):
                    eng.sql(f"INSERT INTO mt VALUES ({k}, {v}, '{s}')")
            else:
                eng.sql(f"INSERT INTO mt VALUES ({k}, {v}, '{s}')")
                model[k] = (v, s)
        elif op == "insert_dup" and model:
            dup = rng.choice(sorted(model))
            with pytest.raises(SparrowError, match="Duplicate entry"):
                eng.sql(f"INSERT INTO mt VALUES ({dup}, {v}, '{s}')")
        elif op == "update":
            r = eng.sql(f"UPDATE mt SET v = {v} WHERE k = {k}")
            if k in model:
                model[k] = (v, model[k][1])
        elif op == "delete":
            eng.sql(f"DELETE FROM mt WHERE s = '{s}' AND k >= {k}")
            model = {
                mk: mv for mk, mv in model.items() if not (mv[1] == s and mk >= k)
            }
        elif op == "replace":
            eng.sql(f"REPLACE INTO mt VALUES ({k}, {v}, '{s}')")
            model[k] = (v, s)
        elif op == "merge":
            eng.sql(
                f"MERGE INTO mt t USING (SELECT {k} AS k, CAST({v} AS DOUBLE) AS v,"
                f" '{s}' AS s) src ON t.k = src.k "
                "WHEN MATCHED THEN UPDATE SET v = src.v "
                "WHEN NOT MATCHED THEN INSERT (k, v, s) VALUES (src.k, src.v, src.s)"
            )
            if k in model:
                model[k] = (v, model[k][1])
            else:
                model[k] = (v, s)
        got = _table_state(eng)
        assert got == model, f"divergence at step {step} after {op}: {got} != {model}"

    eng.sql("DROP TABLE mt")


def test_alter_interleaved_with_dml(model_engine):
    """Schema evolution mid-stream: add a column, insert rows with and
    without it, drop a column, and verify contents after each step —
    the copy-on-write rewrites must preserve all untouched data."""
    eng = model_engine
    eng.sql("CREATE TABLE at (k INT, a CHAR, PRIMARY KEY(k))")
    eng.sql("INSERT INTO at VALUES (1, 'x'), (2, 'y')")
    eng.sql("ALTER TABLE at ADD COLUMN b FLOAT")
    # old rows read NULL for the new column
    rows = {r.k: (r.a, r.b) for r in eng.sql("SELECT * FROM at").df.collect()}
    assert rows == {1: ("x", None), 2: ("y", None)}
    eng.sql("INSERT INTO at VALUES (3, 'z', 9.5)")
    eng.sql("UPDATE at SET b = 1.25 WHERE k = 1")
    rows = {r.k: (r.a, r.b) for r in eng.sql("SELECT * FROM at").df.collect()}
    assert rows == {1: ("x", 1.25), 2: ("y", None), 3: ("z", 9.5)}
    eng.sql("ALTER TABLE at DROP COLUMN a")
    rows = {r.k: r.b for r in eng.sql("SELECT * FROM at").df.collect()}
    assert rows == {1: 1.25, 2: None, 3: 9.5}
    # unique key still enforced after evolution
    import pytest as _pytest

    from sparrow_spark.engine import SparrowError

    with _pytest.raises(SparrowError, match="Duplicate entry"):
        eng.sql("INSERT INTO at VALUES (3, 4.0)")
    eng.sql("DROP TABLE at")
