"""Synthetic CDC fixtures shaped like the reference's golden data
(FIXTURES.md A1/A2; observed from measurement_data_fullload.parquet and
measurement_data_cdc.parquet — generated fresh here, not copied).

Full load: 100 rows, keys MeasurementID-100..199, all on 2022-05-01.
CDC batch: 120 rows — 100 I (keys 200..299, 2022-05-02), 10 U (keys
100..109 → value 100.00), 10 D (keys 200..209), transaction_id 35-char
zero-padded strictly increasing with D > U > I ranges so the same-batch
I-then-D overlap collapses to D under W1 dedup.

Columns arrive UPPERCASE to exercise the lowercasing path
(processData.py:307-308).
"""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

from pyspark.sql import types as T

FULL_SCHEMA = T.StructType(
    [
        T.StructField("MEASUREMENT_ID", T.StringType()),
        T.StructField("MEASUREMENT_DATE_TIME", T.TimestampType()),
        T.StructField("MEASUREMENT_VALUE", T.DecimalType(5, 2)),
        T.StructField("MEASUREMENT_DATE", T.DateType()),
    ]
)

CDC_SCHEMA = T.StructType(
    FULL_SCHEMA.fields
    + [
        T.StructField("Op", T.StringType()),
        T.StructField("transaction_id", T.StringType()),
    ]
)


def _ts(day: int, n: int) -> dt.datetime:
    return dt.datetime(2022, 5, day, 8, 0, 0) + dt.timedelta(seconds=n)


def _txid(n: int) -> str:
    return f"{n:035d}"


def full_load_rows():
    return [
        (
            f"MeasurementID-{100 + i}",
            _ts(1, i),
            Decimal(f"{(i % 90) + 1}.25"),
            dt.date(2022, 5, 1),
        )
        for i in range(100)
    ]


def cdc_rows():
    rows = []
    # 100 inserts: keys 200..299 on 2022-05-02, txids 9..405 (step 4)
    for i in range(100):
        rows.append(
            (
                f"MeasurementID-{200 + i}",
                _ts(2, i),
                Decimal(f"{(i % 90) + 1}.75"),
                dt.date(2022, 5, 2),
                "I",
                _txid(9 + 4 * i),
            )
        )
    # 10 updates: keys 100..109 → value 100.00, txids 421..493 (step 8)
    for i in range(10):
        rows.append(
            (
                f"MeasurementID-{100 + i}",
                _ts(1, i),
                Decimal("100.00"),
                dt.date(2022, 5, 1),
                "U",
                _txid(421 + 8 * i),
            )
        )
    # 10 deletes: keys 200..209 (same-batch overlap with the I set),
    # txids 505..541 (step 4) — strictly greater than the I txids
    for i in range(10):
        rows.append(
            (
                f"MeasurementID-{200 + i}",
                _ts(2, i),
                Decimal(f"{(i % 90) + 1}.75"),
                dt.date(2022, 5, 2),
                "D",
                _txid(505 + 4 * i),
            )
        )
    return rows


def make_full_load_df(spark):
    return spark.createDataFrame(full_load_rows(), FULL_SCHEMA)


def make_cdc_df(spark):
    return spark.createDataFrame(cdc_rows(), CDC_SCHEMA)


# the control record mirroring scripts/config/control_file.json:2-15
CONTROL = dict(
    db_name="msrmt_db",
    schema_name="msrmt_schema",
    table_name="msrmt_table",
    primary_key="measurement_id;measurement_date_time",
    partition_key="measurement_date",
    precombine_field="measurement_value",
    hudi_storage_type="cow",
    glue_job_name="test_job",
    cdc_split_upsert="no",
)
