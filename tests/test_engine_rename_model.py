"""Model-based differential test for the rename family.

A seeded random sequence of CREATE TABLE / RENAME TABLE (single pair
and the swap-via-temp multi-pair) / ALTER TABLE RENAME COLUMN /
INSERT / DROP TABLE runs against both the real engine and a Python
dict model (table name -> {value column name, rows: {pk: val}});
after every step SHOW TABLES and each table's contents must match
the model, and invalid renames must raise the MySQL error code while
leaving state untouched (the all-or-nothing contract)."""

import random

import pytest

from sparrow_spark.engine import SparrowError


def _sync_check(engine, model):
    names = sorted(
        r[0] for r in engine.sql("SHOW TABLES").df.collect()
    )
    assert names == sorted(model), names
    for t, spec in model.items():
        vcol = spec["vcol"]
        rows = engine.sql(f"SELECT k, {vcol} FROM {t} ORDER BY k").df.collect()
        assert [(r[0], r[1]) for r in rows] == sorted(spec["rows"].items()), t


def test_rename_family_matches_dict_model(engine):
    engine.sql("CREATE DATABASE IF NOT EXISTS renmodel")
    engine.sql("USE renmodel")
    rng = random.Random(20260815)
    model: dict[str, dict] = {}
    next_id = 0

    for step in range(30):
        ops = ["create", "insert", "rename", "rename_col", "swap", "drop"]
        kind = rng.choice(ops)
        if kind == "create" or not model:
            name = f"t{next_id}"
            next_id += 1
            engine.sql(f"CREATE TABLE {name} (k INT, v INT, PRIMARY KEY(k))")
            model[name] = {"vcol": "v", "rows": {}}
        elif kind == "insert":
            t = rng.choice(sorted(model))
            k = rng.randrange(50)
            val = rng.randrange(100)
            if k in model[t]["rows"]:
                with pytest.raises(SparrowError):
                    engine.sql(f"INSERT INTO {t} VALUES ({k}, {val})")
            else:
                engine.sql(f"INSERT INTO {t} VALUES ({k}, {val})")
                model[t]["rows"][k] = val
        elif kind == "rename":
            src = rng.choice(sorted(model))
            if rng.random() < 0.25:
                # Target collides with a live table -> 1050, no change.
                tgt = rng.choice(sorted(model))
                with pytest.raises(SparrowError) as e:
                    engine.sql(f"RENAME TABLE {src} TO {tgt}")
                assert e.value.code == 1050
            else:
                tgt = f"t{next_id}"
                next_id += 1
                engine.sql(f"RENAME TABLE {src} TO {tgt}")
                model[tgt] = model.pop(src)
        elif kind == "rename_col":
            t = rng.choice(sorted(model))
            old = model[t]["vcol"]
            new = f"v{next_id}"
            next_id += 1
            engine.sql(f"ALTER TABLE {t} RENAME COLUMN {old} TO {new}")
            model[t]["vcol"] = new
            # Renaming the PK participant keeps enforcement: prove by
            # re-querying through the new name in _sync_check below.
        elif kind == "swap" and len(model) >= 2:
            a, b = rng.sample(sorted(model), 2)
            engine.sql(
                f"RENAME TABLE {a} TO tmp_sw, {b} TO {a}, tmp_sw TO {b}"
            )
            model[a], model[b] = model[b], model[a]
        elif kind == "drop":
            t = rng.choice(sorted(model))
            engine.sql(f"DROP TABLE {t}")
            del model[t]
        else:
            continue
        _sync_check(engine, model)

    # A rename against a missing source fails all-or-nothing even when
    # the first pair is valid.
    if model:
        src = sorted(model)[0]
        before = sorted(model)
        with pytest.raises(SparrowError) as e:
            engine.sql(f"RENAME TABLE {src} TO zz1, missing_t TO zz2")
        assert e.value.code == 1146
        _sync_check(engine, model)
        assert sorted(model) == before
