"""Differential correctness via pytest: every registered query vs its
DuckDB oracle at sf0.001 (the full sweep also runs standalone via
scripts/selfcheck.py, including at sf0.01 = the driver's gate scale)."""

import math

import duckdb
import pytest

from sparrow_spark import registry
from sparrow_spark.sources import TABLES

registry.load_all()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    return str(v)


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    sdf = registry.QUERIES[name](spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    oracle = registry.ORACLES.get(name)
    if oracle is None:
        assert len(srows) > 0, f"{name}: rows-only query returned nothing"
        return
    res = duck.execute(oracle)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert [c.lower() for c in scols] == [c.lower() for c in dcols], "column names differ"
    assert len(srows) == len(drows), "row counts differ"
    order = sorted(range(len(scols)), key=lambda i: scols[i].lower())
    sset = sorted(",".join(canon(r[i]) for i in order) for r in srows)
    dset = sorted(",".join(canon(r[i]) for i in order) for r in drows)
    assert sset == dset, f"{name}: values differ"
