"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.001 and compares
against ``oracle_sql()`` the way the driver does: row count, column names,
and order-insensitive value equality (columns sorted by name, rows sorted).
Catching a mismatch here is 100× cheaper than waiting for CORRECTNESS_r{N}.
"""

from __future__ import annotations

import datetime
import decimal
import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("GHS_PARITY_SF_DIR", "/root/testdata/sf0.001")


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in entry_mod.TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canon(v):
    """Type-tagged canonical string.

    Tagging int vs Decimal is deliberate: DuckDB SUM(INTEGER) — windowed
    included — yields HUGEINT (arrow decimal128) while Spark yields BIGINT;
    the driver's hasher distinguishes them, so the local replica must too
    (round-1 `events_sessionization` escaped because plain str() hid it).
    """
    if v is None:
        return "null"
    if isinstance(v, bool):
        return f"bool:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.10g}"
    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"
    if isinstance(v, int):
        return f"int:{v}"
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return f"ts:{v.isoformat()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def _normalize(cols, rows):
    """Sort columns by name, then rows; canonicalize values with type tags."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)


QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def _arrow_rows(table):
    """pyarrow Table -> (cols, rows) with faithful python types.

    Arrow fetch (not fetchall/collect) so dtype divergence is visible:
    DuckDB HUGEINT surfaces as decimal128 -> Decimal here, but as plain
    int through fetchall().
    """
    cols = table.schema.names
    pydicts = table.to_pylist()
    return cols, [tuple(d[c] for c in cols) for d in pydicts]


def _driver_canon_compat(table):
    """Replicate the driver's canonicalization path and fail loudly if it
    would crash there.

    The driver's ``_canon`` goes ``toPandas()`` then a pandas lexsort over
    all columns. Two crash classes escaped the Arrow-based check in r05:

    * timestamps past pandas' ns range (max 2262-04-11) — pyarrow's
      µs→ns cast overflows in ``to_pandas()`` (``dim_scd2_history``'s
      9999-12-31 sentinel);
    * array cells — pandas' multi-column lexsort factorizes object
      columns by hashing, and ndarray cells are unhashable
      (``corpus_tokenize_ids``'s id arrays).

    ``toPandas()`` is Arrow-backed in Spark 4, so ``Table.to_pandas()``
    on the already-fetched Arrow table reproduces both failure modes
    without re-running the query.
    """
    pdf = table.to_pandas()
    if len(pdf.columns):
        pdf.sort_values(by=list(pdf.columns), kind="mergesort")


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    table = df.toArrow()
    _driver_canon_compat(table)
    spark_cols, spark_rows = _arrow_rows(table)

    if name not in ORACLES:  # rows-only contract
        assert len(spark_rows) >= 0
        return

    con = _duck(SF_DIR)
    rel = con.sql(ORACLES[name])
    duck_cols, duck_rows = _arrow_rows(rel.arrow())

    s_cols, s_vals = _normalize(spark_cols, spark_rows)
    d_cols, d_vals = _normalize(list(duck_cols), duck_rows)

    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_vals) == len(d_vals), (
        f"{name}: row count {len(s_vals)} vs oracle {len(d_vals)}"
    )
    mismatches = [
        (a, b) for a, b in zip(s_vals, d_vals) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} differing rows; first: {mismatches[0]}"
    )


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert {f.name for f in df.schema} == {"event_type", "n", "total_value"}
