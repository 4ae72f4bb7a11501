"""Round-15 regression tests: ADVICE fixes verified independently of
the standard fixtures (which never exercise the edge cases flagged)."""

import duckdb
import pandas as pd
import pytest

from sparrow_spark import registry

registry.load_all()


@pytest.fixture(scope="module")
def nodup_dir(tmp_path_factory):
    """A documents corpus with ZERO permutation-duplicate pairs: every
    document has a unique distinct-token set, so q_blocking_quality's
    truth-pair self-join is empty — the case the r14 ADVICE flagged
    (Spark's grouped `covered` collapses to 0 rows while the oracle's
    ungrouped FILTER aggregates still emit one row per scheme)."""
    d = tmp_path_factory.mktemp("nodup")
    rows = []
    for i in range(40):
        rows.append(
            {
                "doc_id": i,
                "text": f"alpha{i} beta{i} gamma{i} delta{i}",
                "lang": "en",
                "source": "s0",
                "n_chars": 30,
            }
        )
    pd.DataFrame(rows).to_parquet(str(d / "documents.parquet"))
    return str(d)


def test_blocking_quality_empty_truth_set_matches_oracle(spark, nodup_dir):
    sdf = registry.QUERIES["q_blocking_quality"](spark, nodup_dir)
    srows = {tuple(r)[0]: tuple(r) for r in sdf.collect()}
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{nodup_dir}/documents.parquet'"
    )
    res = con.execute(registry.ORACLES["q_blocking_quality"])
    drows = {r[0]: r for r in res.fetchall()}
    assert set(srows) == {"first_last", "n_tokens", "prefix8"}, (
        "Spark must emit one row per scheme even with zero truth pairs"
    )
    assert set(drows) == set(srows)
    for scheme in srows:
        s, o = srows[scheme], drows[scheme]
        # scheme, n_blocks, candidate_pairs, truth_pairs, covered_pairs
        assert s[1:5] == o[1:5], f"{scheme}: counts diverge {s} vs {o}"
        assert s[3] == 0 and s[4] == 0
        # pairs_completeness is 0/0 — both engines must agree on the
        # representation (NULL in Spark; DuckDB double 0/0 too)
        assert (s[5] is None) == (o[5] is None), (
            f"{scheme}: completeness repr diverges {s[5]!r} vs {o[5]!r}"
        )
        assert s[6] == pytest.approx(o[6])


def test_check_if_fresh_enforces_non_addition_slots(monkeypatch, capsys):
    """The r14 ADVICE gap: with a mid-round addition registered but
    not yet inserted, --check-if-fresh used to skip enforcement
    entirely, so an unexcused reordering of EXISTING slots passed the
    gate. It must now diff the non-addition slots against the window
    recomputed without the additions."""
    import os
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "scripts")
    )
    import window_rotate as wr

    fake = "q_fake_r15_addition"
    monkeypatch.setitem(registry.RAW_QUERIES, fake, lambda s, d: None)
    monkeypatch.setattr(sys, "argv", ["window_rotate.py", "--check-if-fresh"])

    # well-formed state: pinned slots = rule output minus the addition
    assert wr.main() == 0
    out = capsys.readouterr().out
    assert "non-addition slots match" in out
    assert fake in out

    # an unexcused swap of two existing slots must now FAIL the gate
    swapped = list(registry._WINDOW_PRIORITY)
    swapped[0], swapped[1] = swapped[1], swapped[0]
    monkeypatch.setattr(registry, "_WINDOW_PRIORITY", swapped)
    assert wr.main() == 1
    assert "MISMATCH" in capsys.readouterr().out


def test_bench_compare_adjudicates_without_ratcheting_baseline(
    tmp_path, monkeypatch, capsys
):
    """The r14 ADVICE ratchet: --remeasure used to fold min(old,
    fresh) into bench_detail.json, permanently tightening the
    committed baseline. Now the fresh reading lives in a `remeasured`
    side-channel and bench_compare uses it for flag ADJUDICATION only:
    a burst artifact clears, a reproduced regression still fails, and
    the persisted `queries` values stay the honest full-run times."""
    import json as _json
    import os
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "scripts")
    )
    import bench_compare as bc

    old = tmp_path / "old.json"
    new = tmp_path / "new.json"
    old.write_text(_json.dumps({"queries": {"qa": 0.1, "qb": 0.2}}))

    doc = {
        "queries": {"qa": 0.11, "qb": 0.5},
        "remeasured": {"qb": {"full_run": 0.5, "fresh": 0.21}},
    }
    new.write_text(_json.dumps(doc))
    monkeypatch.setattr(sys, "argv", ["bench_compare.py", str(old), str(new)])
    assert bc.main() == 0  # burst artifact: fresh reading clears it
    assert "remeasure-adjudicated" in capsys.readouterr().out
    # the persisted full-run value must NOT have been ratcheted
    assert _json.loads(new.read_text())["queries"]["qb"] == 0.5

    doc["remeasured"]["qb"]["fresh"] = 0.48
    new.write_text(_json.dumps(doc))
    assert bc.main() == 1  # genuine regression reproduces
    assert "REGRESSION qb" in capsys.readouterr().out
