"""Contract test: every queries() entry runs at sf0.001 and, where an
oracle_sql() twin exists, matches DuckDB row-for-row (the same comparison
the driver makes at sf0.01: row count + sorted-column value equality)."""

from __future__ import annotations

import math

import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = round(v, 6)
                if math.isnan(v):
                    v = "nan"
            vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_runs_and_matches_oracle(spark, ddb, name):
    fn = entrymod.queries()[name]
    df = fn(spark, SF_DIR)
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    assert rows is not None
    sql = entrymod.oracle_sql().get(name)
    if sql is None:
        return  # rows-only operators (sketch/LSH): just assert they run
    res = ddb.sql(sql)
    oracle_cols = [d[0] for d in res.description]
    oracle_rows = res.fetchall()
    assert sorted(cols) == sorted(oracle_cols), (cols, oracle_cols)
    assert len(rows) == len(oracle_rows), (name, len(rows), len(oracle_rows))
    assert _normalize(rows, cols) == _normalize(oracle_rows, oracle_cols), name


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert df.columns == ["word", "cnt"]


def test_driver_gate_window_invariant():
    """Structural guard for the ORDERING POLICY in queries(): the driver
    attests only the FIRST 50 entries per round, so every query without a
    green row in CORRECTNESS_r04.json (new this round, or code-touched so
    its old row no longer vouches for it) MUST sit inside the window —
    otherwise it could ship with no independent driver evidence at all.
    The policy itself (why the tail is safe) lives in the queries()
    comment and README; this test pins the invariant mechanically."""
    import json

    names = list(entrymod.queries())
    window = set(names[:50])
    with open("/root/repo/CORRECTNESS_r04.json") as f:
        r04 = {
            k for k, v in json.load(f).items()
            if v.get("rows_match") and v.get("hash_match") is not False
        }
    # queries whose round-5 code changes invalidate the r04 attestation
    touched = {
        "curation_full", "corpus_build", "dup_span_removal", "doc_chunks",
        "crawl_budget",
    }
    unattested = (set(names) - r04) | touched
    outside = unattested - window
    assert not outside, (
        f"never-/stale-attested queries outside the 50-row gate window: "
        f"{sorted(outside)}"
    )
    # and every oracle key actually has a query (no orphan oracles)
    assert set(entrymod.oracle_sql()) <= set(names)
