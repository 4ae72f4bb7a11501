"""Model-based differential test for the engine's upsert family.

A seeded random sequence of INSERT / INSERT IGNORE / INSERT ... ON
DUPLICATE KEY UPDATE / REPLACE / DELETE statements runs against BOTH
the real engine (copy-on-write parquet, set-at-a-time algebra) and a
20-line Python dict model of MySQL semantics; the final table states
must be identical. This catches semantic drift the example-based
tests can't — interaction orders, multi-row batches, collisions
created by earlier statements in the same sequence.
"""

import random

import pytest


def _expected_affected(kind, model, rows):
    if kind == "insert_ignore":
        landed = 0
        seen = set()
        for k, _v in rows:
            if k not in model and k not in seen:
                landed += 1
                seen.add(k)
        return landed
    if kind == "odku":
        # sequential fold (r11): a key's first occurrence inserts when
        # new, every later occurrence in the same batch updates.
        n = 0
        seen = set()
        for k, _v in rows:
            if k in model or k in seen:
                n += 2
            else:
                n += 1
                seen.add(k)
        return n
    if kind == "replace":
        return len(rows)
    return None


def _apply_model(kind, model, rows):
    if kind == "insert":
        for k, v in rows:
            model[k] = v
    elif kind == "insert_ignore":
        for k, v in rows:
            model.setdefault(k, v)
    elif kind == "odku":
        for k, v in rows:
            if k in model:
                model[k] = model[k] + v  # bal = bal + VALUES(bal)
            else:
                model[k] = v
    elif kind == "replace":
        for k, v in rows:
            model[k] = v


def test_upsert_family_matches_dict_model(engine):
    engine.sql("CREATE DATABASE IF NOT EXISTS modeldb")
    engine.sql("USE modeldb")
    engine.sql("CREATE TABLE m (k INT, v INT, PRIMARY KEY(k))")
    rng = random.Random(20260815)
    model: dict[int, int] = {}
    from sparrow_spark.engine import SparrowError

    for step in range(40):
        kind = rng.choice(
            ["insert", "insert_ignore", "odku", "replace", "delete"]
        )
        if kind == "delete":
            cut = rng.randrange(0, 20)
            r = engine.sql(f"DELETE FROM m WHERE k < {cut}")
            removed = [k for k in model if k < cut]
            assert r.affected_rows == len(removed), step
            for k in removed:
                del model[k]
            continue
        # batches with intra-batch-unique keys (plain INSERT with a
        # stored collision must error and leave state unchanged) —
        # except ODKU, whose batches draw WITH replacement so
        # intra-batch duplicate keys exercise the sequential fold
        # (the dict model's in-order walk IS MySQL's fold).
        if kind == "odku":
            keys = rng.choices(range(20), k=rng.randrange(1, 5))
        else:
            keys = rng.sample(range(20), rng.randrange(1, 4))
        rows = [(k, rng.randrange(100)) for k in keys]
        values = ", ".join(f"({k}, {v})" for k, v in rows)
        if kind == "insert":
            if any(k in model for k in keys):
                with pytest.raises(SparrowError, match="Duplicate entry"):
                    engine.sql(f"INSERT INTO m VALUES {values}")
                continue
            engine.sql(f"INSERT INTO m VALUES {values}")
        elif kind == "insert_ignore":
            r = engine.sql(f"INSERT IGNORE INTO m VALUES {values}")
            assert r.affected_rows == _expected_affected(kind, model, rows), step
        elif kind == "odku":
            r = engine.sql(
                f"INSERT INTO m VALUES {values} "
                "ON DUPLICATE KEY UPDATE v = v + VALUES(v)"
            )
            assert r.affected_rows == _expected_affected(kind, model, rows), step
        elif kind == "replace":
            r = engine.sql(f"REPLACE INTO m VALUES {values}")
            assert r.affected_rows == _expected_affected(kind, model, rows), step
        _apply_model(kind, model, rows)

    got = {
        r.k: r.v for r in engine.sql("SELECT k, v FROM m").df.collect()
    }
    assert got == model
    engine.sql("DROP TABLE m")
