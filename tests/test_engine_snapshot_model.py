"""Model-based differential test for ENGINE=SNAPSHOT versioning.

A seeded random walk drives INSERT / UPDATE / DELETE / RESTORE /
OPTIMIZE through the real dispatcher against a snapshot table while a
pure-Python model tracks the expected version history (a list of
id->v dict states) and live state. After every step the engine's live
rows and version count must match the model; at the end every
version still retained must time-travel to the model's state for it,
the change feed must replay onto the oldest retained state to
reproduce the live table, and VACUUM must drop exactly the modeled
manifests. This is the same dict-model discipline as
tests/test_engine_model.py, aimed at the commit-log invariants:
 - no-empty-commit: an op that changes no file set appends no version;
 - RESTORE and OPTIMIZE always append (they rewrite the file set)
   even when logically idempotent — but the FEED stays silent for
   pure physical rewrites (content compare);
 - versions are strictly consecutive integers (no gaps, no repeats).
"""

import random

import pytest

from sparrow_spark.engine import SparrowError


def _versions(engine):
    return [
        (r.version, r.op)
        for r in engine.sql("SHOW VERSIONS FROM m").df.collect()
    ]


def _region(i):
    # partitioned variant: the partition value is derived from the id,
    # so reads must recover it from the <col>=<val>/ pool paths — the
    # basePath subtlety the flat variant cannot exercise.
    return f"r{i % 3}"


def _live(engine, part):
    if part:
        return {
            r.id: (r.v, r.region)
            for r in engine.sql("SELECT id, v, region FROM m").df.collect()
        }
    return {
        r.id: r.v for r in engine.sql("SELECT id, v FROM m").df.collect()
    }


def _asof(engine, v, part):
    if part:
        return {
            r.id: (r.v, r.region)
            for r in engine.sql(
                f"SELECT id, v, region FROM m VERSION AS OF {v}"
            ).df.collect()
        }
    return {
        r.id: r.v
        for r in engine.sql(
            f"SELECT id, v FROM m VERSION AS OF {v}"
        ).df.collect()
    }


def _expect(state, part):
    if part:
        return {i: (v, _region(i)) for i, v in state.items()}
    return dict(state)


@pytest.mark.parametrize("seed,part", [(7, False), (23, False), (7, True)])
def test_snapshot_version_model_walk(engine, seed, part):
    engine.sql("CREATE DATABASE IF NOT EXISTS snapmodel")
    engine.sql("USE snapmodel")
    if part:
        engine.sql(
            "CREATE TABLE m (id INT, v INT, region CHAR, PRIMARY KEY(id)) "
            "ENGINE=SNAPSHOT PARTITIONED BY (region)"
        )
    else:
        engine.sql(
            "CREATE TABLE m (id INT, v INT, PRIMARY KEY(id)) ENGINE=SNAPSHOT"
        )
    rng = random.Random(seed)
    # model: states[k] = dict state AS OF version k; live = states[-1]
    states = [{}]  # v0 = create (empty)
    next_id = 0

    def live():
        return dict(states[-1])

    for step in range(24):
        op = rng.choice(["insert", "insert", "update", "delete", "restore", "optimize"])
        cur = live()
        if op == "insert":
            n = rng.randint(1, 3)
            rows = []
            st = dict(cur)
            for _ in range(n):
                next_id += 1
                st[next_id] = next_id * 10
                if part:
                    rows.append(
                        f"({next_id}, {next_id * 10}, '{_region(next_id)}')"
                    )
                else:
                    rows.append(f"({next_id}, {next_id * 10})")
            engine.sql(f"INSERT INTO m VALUES {', '.join(rows)}")
            states.append(st)
        elif op == "update":
            delta = rng.randint(1, 9)
            mod = rng.randint(2, 4)
            matched = {k for k in cur if k % mod == 0}
            engine.sql(f"UPDATE m SET v = v + {delta} WHERE id % {mod} = 0")
            if matched:
                st = dict(cur)
                for k in matched:
                    st[k] = st[k] + delta
                states.append(st)
            # else: file set unchanged -> no version (no-empty-commit)
        elif op == "delete":
            mod = rng.randint(3, 5)
            matched = {k for k in cur if k % mod == 1}
            engine.sql(f"DELETE FROM m WHERE id % {mod} = 1")
            if matched:
                states.append({k: v for k, v in cur.items() if k not in matched})
        elif op == "restore":
            nonempty = [i for i, s in enumerate(states) if s]
            if not nonempty:
                continue
            target = rng.choice(nonempty)
            engine.sql(f"RESTORE TABLE m TO VERSION {target}")
            # restore rewrites the whole file set -> always a new version
            states.append(dict(states[target]))
        elif op == "optimize":
            if not cur:
                continue  # empty-table rewrite behavior is layout-defined
            engine.sql("OPTIMIZE TABLE m")
            # fresh file names -> new version, same rows
            states.append(dict(cur))
        hist = _versions(engine)
        assert [h[0] for h in hist] == list(range(len(states))), (
            f"step {step} ({op}): version ids {[h[0] for h in hist]} "
            f"!= model 0..{len(states) - 1}"
        )
        assert _live(engine, part) == _expect(states[-1], part), (
            f"step {step} ({op}): live mismatch"
        )

    # every retained version time-travels to the modeled state
    for k in range(len(states)):
        assert _asof(engine, k, part) == _expect(states[k], part), (
            f"AS OF {k} mismatch"
        )

    # the change feed replays the oldest state into the live state
    last = len(states) - 1
    feed = engine.sql(
        f"SELECT _commit_version AS cv, _change_type AS ct, id, v "
        f"FROM m CHANGES BETWEEN 0 AND {last} ORDER BY cv"
    ).df.collect()
    replay = {}
    for r in feed:
        if r.ct in ("insert", "update_postimage"):
            replay[r.id] = r.v
        elif r.ct == "delete":
            del replay[r.id]
    assert replay == states[-1]
    # per-commit slices agree with the model's adjacent-state diffs
    by_ver = {}
    for r in feed:
        by_ver.setdefault(r.cv, []).append(r)
    for k in range(1, len(states)):
        prev, cur = states[k - 1], states[k]
        ins = {i for i in cur if i not in prev}
        dele = {i for i in prev if i not in cur}
        upd = {i for i in cur if i in prev and cur[i] != prev[i]}
        got = by_ver.get(k, [])
        assert {(r.ct, r.id) for r in got} == (
            {("insert", i) for i in ins}
            | {("delete", i) for i in dele}
            | {("update_preimage", i) for i in upd}
            | {("update_postimage", i) for i in upd}
        ), f"feed slice for version {k} mismatch"

    # vacuum to the last 3 versions: exactly the modeled manifests drop
    engine.sql("VACUUM m RETAIN 3 VERSIONS")
    kept = [h[0] for h in _versions(engine)]
    assert kept == list(range(len(states) - 3, len(states)))
    for k in kept:
        assert _asof(engine, k, part) == _expect(states[k], part)
    with pytest.raises(SparrowError, match="does not exist"):
        engine.sql(f"SELECT * FROM m VERSION AS OF {kept[0] - 1}")
    assert _live(engine, part) == _expect(states[-1], part)
    engine.sql("DROP TABLE m")
