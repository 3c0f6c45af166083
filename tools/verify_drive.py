"""End-to-end drive of the library/pipeline surface (verify skill #1).

Land parquet in a raw dir, run CdcPipeline: initial load -> incremental
merge (190-row golden check) -> bookmark noop -> time travel.
"""
import shutil
import sys
from pathlib import Path

HERE = __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__)))
sys.path.insert(0, HERE)

from glue_hudi_spark.session import get_spark
from glue_hudi_spark.config import JobControl
from glue_hudi_spark.pipeline import CdcPipeline
from glue_hudi_spark.storage.native import NativeTable

sys.path.insert(0, HERE + "/tests")
from fixtures_cdc import CONTROL, make_cdc_df, make_full_load_df

root = Path("/tmp/verify_ghs/run")
shutil.rmtree(root, ignore_errors=True)
raw, curated = root / "raw", root / "curated"

spark = get_spark(app_name="verify-drive", master="local[4]")
ctl = JobControl(**CONTROL)
pipe = CdcPipeline(spark, raw, curated, sync_catalog=False)
land = raw / ctl.db_name / ctl.schema_name / ctl.table_name

# 1. initial load
make_full_load_df(spark).write.mode("overwrite").parquet(str(land / "full"))
r1 = pipe.process_table(ctl)
assert r1.mode == "initial", r1
tbl = NativeTable.for_control(spark, curated, ctl)
n1 = tbl.read_snapshot().count()
assert n1 == 100, n1

# 2. incremental merge -> golden 190-row state
make_cdc_df(spark).write.mode("overwrite").parquet(str(land / "cdc"))
r2 = pipe.process_table(ctl)
assert r2.mode == "incremental", r2
snap = tbl.read_snapshot()
rows = snap.count()
assert rows == 190, rows
keys = {r[0] for r in snap.select("measurement_id").collect()}
assert not any(f"MeasurementID-{k}" in keys for k in range(200, 210)), "deleted keys present"
hundred = snap.filter("measurement_value = 100.00").count()
assert hundred == 10, hundred

# 3. bookmark noop
r3 = pipe.process_table(ctl)
assert r3.mode == "noop", r3

# 4. time travel back to the initial load
first = tbl.timeline.history()[0].commit_id
n_tt = tbl.read_snapshot(as_of=first).count()
assert n_tt == 100, n_tt

print("DRIVE OK: initial=100, merged=190, deletes gone, 10x value=100.00, noop, time-travel=100")
spark.stop()
