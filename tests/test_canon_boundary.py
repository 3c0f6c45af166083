"""Driver-canon boundary property test (round-5 verdict item 7).

The driver's correctness gate canonicalizes every query result via
``toPandas()`` + a pandas lexsort over all columns. Two crash classes
escaped local testing in r05 (ns-overflow timestamps, array cells).
This test replays seeded-random batches of BOUNDARY values — timestamps
at the edges of pandas' ns range, extreme decimals, NaN/inf doubles,
nulls — through the NativeTable merge path, then pushes the snapshot
through the exact driver canon and asserts it survives and round-trips.
"""

from __future__ import annotations

import datetime as dt
import decimal
import random

import pytest

from glue_hudi_spark.storage.native import NativeTable

# pandas datetime64[ns] bounds are 1677-09-21..2262-04-11; stay just
# inside so the generated data is canon-representable (the repo's
# contract: no query output may carry a timestamp outside this range)
TS_CHOICES = [
    dt.datetime(1677, 9, 22, 0, 0, 1),
    dt.datetime(1970, 1, 1, 0, 0, 0),
    dt.datetime(2200, 1, 1, 0, 0, 0),      # the SCD2 open-interval sentinel
    dt.datetime(2262, 4, 10, 23, 59, 59, 999999),
    None,
]
DEC_CHOICES = [
    decimal.Decimal("0.01"),
    decimal.Decimal("-99999999999999.99"),
    decimal.Decimal("99999999999999.99"),
    decimal.Decimal("0.00"),
    None,
]
DBL_CHOICES = [0.0, -0.0, 1e-300, 1e300, float("nan"), float("inf"),
               float("-inf"), None]


def _driver_canon(df):
    """The driver's canonicalization path: Arrow-backed toPandas, then a
    lexsort over every column (factorizes object columns by hashing)."""
    pdf = df.toPandas()
    if len(pdf.columns):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    return pdf


@pytest.mark.parametrize("seed", [11, 23])
def test_merge_path_outputs_survive_driver_canon(spark, tmp_path, seed):
    rng = random.Random(seed)
    t = NativeTable(
        spark, str(tmp_path / f"canon{seed}"), record_keys=["id"],
        precombine="v", partition_keys=[],
    )
    schema = ("id string, v int, ts timestamp, amt decimal(16,2), "
              "x double")
    for batch in range(3):
        rows = [
            (f"k{rng.randrange(20):02d}", batch * 100 + i,
             rng.choice(TS_CHOICES), rng.choice(DEC_CHOICES),
             rng.choice(DBL_CHOICES))
            for i in range(15)
        ]
        t.upsert(spark.createDataFrame(rows, schema))
    snap = t.read_snapshot()
    pdf = _driver_canon(snap)
    assert len(pdf) == snap.count()
    # values round-trip: every non-null timestamp stays inside ns range
    ts = pdf["ts"].dropna()
    assert ts.empty or (ts.min() >= dt.datetime(1677, 9, 22)
                        and ts.max() <= dt.datetime(2262, 4, 11))


def test_scd2_output_survives_driver_canon(spark):
    """The exact r05 red, replayed end-to-end at the operator level."""
    from glue_hudi_spark.operators import scd2

    ev = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), "a"),
         (1, dt.datetime(2024, 2, 1), "b"),
         (2, dt.datetime(2024, 1, 15), "a")],
        "k int, ts timestamp, attr string")
    out = scd2.scd2_build(ev, ["k"], "ts", ["attr"])
    pdf = _driver_canon(out)
    assert len(pdf) == 3
    assert pdf["valid_to"].max() == dt.datetime(2200, 1, 1)
