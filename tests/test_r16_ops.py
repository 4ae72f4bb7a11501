"""Round-16 tests: unit tests for the r16 ADVICE fixes (bench
remeasure burst threshold, sinkhorn empty-token divergence; the
lock-break identity/heartbeat fixes live in
test_engine_concurrency.py), plus brute-force re-derivations (plain
Python — pandas / numpy / hashlib, independent of the DuckDB oracle,
so a shared misunderstanding between query and oracle is still
caught) for the r16 additions."""

import math

import pandas as pd
import pytest

from sparrow_spark import registry

registry.load_all()


def _run(spark, sf_dir, name):
    return registry.RAW_QUERIES[name](spark, sf_dir).toPandas()


# ---------------------------------------------------------------------------
# r16 ADVICE fixes
# ---------------------------------------------------------------------------


def test_bench_burst_threshold_matches_compare_gate():
    """bench.py's remeasure fold and bench_compare's flag gate must
    use the SAME materiality threshold: replacing the persisted
    baseline on any-margin-faster fresh readings was the r15 ADVICE
    one-way ratchet."""
    import os
    import sys

    sys.path.insert(0, "/root/repo")
    sys.path.insert(0, os.path.join("/root/repo", "scripts"))
    import bench
    import bench_compare as bc

    assert bench._BURST_X == bc.REGRESSION_X
    # small jitter stays with the full-run reading...
    assert not bench._burst_replaces(0.5, 0.45)
    assert not bench._burst_replaces(0.5, 0.34)
    # ...only a regression-scale gap proves a burst
    assert bench._burst_replaces(0.5, 0.33)
    assert not bench._burst_replaces(0.5, 0.6)


@pytest.fixture(scope="module")
def doublespace_dir(tmp_path_factory):
    """A corpus where consecutive spaces make the EMPTY token the most
    frequent 'word' — the case the r15 ADVICE flagged for
    q_sinkhorn_ot: '' in the top-16 vocab puts len 0 on the ground
    cost diagonal (DuckDB NaN vs Spark null) unless both engines
    filter it."""
    d = tmp_path_factory.mktemp("dspace")
    rows = []
    for i in range(30):
        src = "src0" if i % 2 == 0 else "src1"
        rows.append(
            {
                "doc_id": i,
                "text": f"alpha  beta   gamma  tok{i % 7}  delta",
                "lang": "en",
                "source": src,
                "n_chars": 40,
            }
        )
    pd.DataFrame(rows).to_parquet(str(d / "documents.parquet"))
    return str(d)


def test_sinkhorn_ot_ignores_empty_tokens(spark, doublespace_dir):
    import duckdb

    sdf = registry.RAW_QUERIES["q_sinkhorn_ot"](spark, doublespace_dir)
    srows = sdf.toPandas().sort_values("iter").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{doublespace_dir}/documents.parquet'"
    )
    drows = (
        con.execute(registry.ORACLES["q_sinkhorn_ot"])
        .df()
        .sort_values("iter")
        .reset_index(drop=True)
    )
    assert len(srows) == len(drows) == 3
    for c in ("sinkhorn_cost", "col_marginal_gap"):
        for s, o in zip(srows[c], drows[c]):
            assert not (math.isnan(s) or math.isnan(o))
            assert s == pytest.approx(o, abs=2e-6)


def test_bench_compare_flags_aux_drain_regressions(
    tmp_path, monkeypatch, capsys
):
    """r16: the aux streaming drains are inside the flag machinery —
    a drain whose total wall time regresses past REGRESSION_X (and
    the aux absolute floor) fails the compare; jitter under the floor
    passes."""
    import json as _json
    import os
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "scripts")
    )
    import bench_compare as bc

    old = tmp_path / "old.json"
    new = tmp_path / "new.json"
    old.write_text(
        _json.dumps(
            {
                "queries": {"qa": 0.1},
                "aux_queries": {
                    "s1": {"total_sec": 5.0, "busy_sec": 3.0},
                    "s2": {"total_sec": 2.0, "busy_sec": 1.0},
                },
            }
        )
    )
    doc = {
        "queries": {"qa": 0.1},
        "aux_queries": {
            "s1": {"total_sec": 5.4, "busy_sec": 3.2},  # jitter: passes
            "s2": {"total_sec": 2.2, "busy_sec": 1.1},
        },
    }
    new.write_text(_json.dumps(doc))
    monkeypatch.setattr(
        sys, "argv", ["bench_compare.py", str(old), str(new)]
    )
    assert bc.main() == 0
    assert "AUX REGRESSION" not in capsys.readouterr().out

    doc["aux_queries"]["s2"] = {"total_sec": 3.5, "busy_sec": 2.9}
    new.write_text(_json.dumps(doc))
    assert bc.main() == 1
    assert "AUX REGRESSION s2" in capsys.readouterr().out


def test_bench_compare_aux_remeasure_adjudicates(
    tmp_path, monkeypatch, capsys
):
    """r16: a flagged aux drain clears when the remeasured_aux
    side-channel's fresh reading is inside the gate, and a reproduced
    drain regression still fails — the drain twin of the headline
    adjudication."""
    import json as _json
    import os
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "scripts")
    )
    import bench_compare as bc

    old = tmp_path / "old.json"
    new = tmp_path / "new.json"
    old.write_text(
        _json.dumps(
            {
                "queries": {"qa": 0.1},
                "aux_queries": {"s1": {"total_sec": 5.0, "busy_sec": 3.0}},
            }
        )
    )
    doc = {
        "queries": {"qa": 0.1},
        "aux_queries": {"s1": {"total_sec": 9.0, "busy_sec": 7.0}},
        "remeasured_aux": {
            "s1": {
                "full_run": {"total_sec": 9.0, "busy_sec": 7.0},
                "fresh": {"total_sec": 5.3, "busy_sec": 3.1},
            }
        },
    }
    new.write_text(_json.dumps(doc))
    monkeypatch.setattr(
        sys, "argv", ["bench_compare.py", str(old), str(new)]
    )
    assert bc.main() == 0
    assert "remeasure-adjudicated aux" in capsys.readouterr().out

    doc["remeasured_aux"]["s1"]["fresh"]["total_sec"] = 8.7
    new.write_text(_json.dumps(doc))
    assert bc.main() == 1
    assert "AUX REGRESSION s1" in capsys.readouterr().out
