"""CLI subcommands driven in-process (main(argv) — getOrCreate reuses the
test session)."""

from __future__ import annotations

import json
from pathlib import Path

from glue_hudi_spark.__main__ import main
from glue_hudi_spark.config import ControlStore, JobControl
from tests.fixtures_cdc import CONTROL, make_cdc_df, make_full_load_df


def _land(df, raw_dir: Path, name: str):
    stage = str(raw_dir) + "__s__" + name
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    raw_dir.mkdir(parents=True, exist_ok=True)
    for i, p in enumerate(Path(stage).glob("*.parquet")):
        p.rename(raw_dir / f"{name}_{i}.parquet")


def test_cli_full_lifecycle(spark, tmp_path, capsys):
    ctl = JobControl(**CONTROL)
    control = tmp_path / "control.json"
    ControlStore(control).save([ctl])
    raw = tmp_path / "raw" / ctl.db_name / ctl.schema_name / ctl.table_name
    base = ["--control", str(control), "--curated", str(tmp_path / "curated")]
    raw_args = ["--raw", str(tmp_path / "raw")]

    def run_cmd(*argv):
        rc = main(list(argv))
        out = capsys.readouterr().out.strip().splitlines()[-1]
        return rc, json.loads(out)

    _land(make_full_load_df(spark), raw, "LOAD1")
    rc, out = run_cmd("run", *base, *raw_args)
    assert rc == 0 and out[0]["mode"] == "initial"

    _land(make_cdc_df(spark), raw, "CDC1")
    rc, out = run_cmd("run", *base, *raw_args, "--single-commit")
    assert rc == 0 and out[0]["mode"] == "incremental"
    assert out[0]["commits"] == ["merge"]

    rc, out = run_cmd("show", *base)
    assert out[0]["rows"] == 190

    # optimize bin-packs the merge's sliver files; rows unchanged
    rc, out = run_cmd("optimize", *base, "--target-mb", "1")
    assert rc == 0 and "optimized" in out[0]
    rc, out = run_cmd("show", *base)
    assert out[0]["rows"] == 190

    # clone branches the table zero-copy; original untouched
    rc, out = run_cmd("clone", *base, "--dest", str(tmp_path / "branch"))
    assert rc == 0 and out[0]["cloned_to"].endswith(ctl.table_name)
    rc, out = run_cmd("show", *base)
    assert out[0]["rows"] == 190

    # rollback to the initial load (explicit target: the optimize commit
    # sits between, so "one before latest" would restore the merge)
    rc, out = run_cmd("rollback", *base, "--to-commit", "1")
    assert rc == 0 and out[0]["restored"] >= 1
    rc, out = run_cmd("show", *base)
    assert out[0]["rows"] == 100

    # pull exports the change feed since commit 1 (the rollback replay is
    # commit 3 referencing commit 1's files, so the incremental feed has
    # those rows "re-landed" — exactly the consumer contract)
    outdir = str(tmp_path / "feed")
    rc, out = run_cmd("pull", *base, "--since-commit", "1", "--out", outdir)
    assert rc == 0 and out[0]["rows"] >= 0 and out[0]["mode"] == "incremental"
    rc, out = run_cmd("pull", *base, "--since-commit", "1", "--out",
                      str(tmp_path / "feed_cdf"), "--cdf")
    assert rc == 0 and out[0]["mode"] == "cdf"

    # destructive restore rewinds the timeline itself to commit 1
    rc, out = run_cmd("restore", *base, "--to-commit", "1")
    assert rc == 0 and out[0]["restored_to"] == 1 and out[0]["rolled_back"]
    rc, out = run_cmd("show", *base)
    assert out[0]["rows"] == 100
    assert [c["id"] for c in out[0]["commits"]] == [1]
    assert out[0]["commits"][0]["rows"] == 100
    assert out[0]["commits"][0]["bytes"] > 0

    rc, out = run_cmd("reset", *base, *raw_args)
    assert out[0]["reset"] is True
    rc, out = run_cmd("run", *base, *raw_args)
    assert out[0]["mode"] == "initial"

    rc, out = run_cmd("show", *base, "--table", "missing")
    assert rc == 2 and "error" in out


def test_cli_replicate(spark, tmp_path, capsys):
    ctl = JobControl(**CONTROL)
    control = tmp_path / "control.json"
    ControlStore(control).save([ctl])
    raw = tmp_path / "raw" / ctl.db_name / ctl.schema_name / ctl.table_name
    base = ["--control", str(control), "--curated", str(tmp_path / "curated")]
    _land(make_full_load_df(spark), raw, "full")
    main(["run", *base, "--raw", str(tmp_path / "raw")])
    capsys.readouterr()

    rc = main(["replicate", *base, "--dest", str(tmp_path / "replica"),
               "--checkpoint", str(tmp_path / "ck"), "--sync-deletes"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out[0]["replica_rows"] == 100
    assert out[0]["deletes_propagated"] == 0

    # CDC lands upstream; a second drain syncs the replica
    _land(make_cdc_df(spark), raw, "cdc")
    main(["run", *base, "--raw", str(tmp_path / "raw"), "--single-commit"])
    capsys.readouterr()
    main(["replicate", *base, "--dest", str(tmp_path / "replica"),
          "--checkpoint", str(tmp_path / "ck"), "--sync-deletes"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out[0]["replica_rows"] == 190        # the golden CDC expectation
    # the golden batch's deletes are same-batch I->D, resolved inside the
    # upstream merge — nothing ever reached the replica to reconcile
    assert out[0]["deletes_propagated"] == 0

    # an upstream hard delete DOES need reconciliation
    from glue_hudi_spark.pipeline import CdcPipeline
    from glue_hudi_spark.session import get_spark
    src = CdcPipeline(get_spark(), "unused",
                      str(tmp_path / "curated"))._table(ctl)
    gone = src.read_snapshot().limit(5).select(
        "measurement_id", "measurement_date_time", "measurement_date")
    src.delete(gone)
    main(["replicate", *base, "--dest", str(tmp_path / "replica"),
          "--checkpoint", str(tmp_path / "ck"), "--sync-deletes"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out[0]["replica_rows"] == 185
    assert out[0]["deletes_propagated"] == 5


def test_cli_rename_and_drop_column(spark, tmp_path, capsys):
    # the golden control marks value/date as precombine/partition
    # (structural — protected from DDL); use a free-column variant
    ctl = JobControl(**{**CONTROL,
                        "primary_key": "measurement_id",
                        "precombine_field": "measurement_date_time",
                        "partition_key": ""})
    control = tmp_path / "control.json"
    ControlStore(control).save([ctl])
    raw = tmp_path / "raw" / ctl.db_name / ctl.schema_name / ctl.table_name
    base = ["--control", str(control), "--curated", str(tmp_path / "curated")]

    def run_cmd(*argv):
        rc = main(list(argv))
        out = capsys.readouterr().out.strip().splitlines()[-1]
        return rc, json.loads(out)

    _land(make_full_load_df(spark), raw, "LOAD1")
    rc, _ = run_cmd("run", *base, "--raw", str(tmp_path / "raw"))
    assert rc == 0
    rc, out = run_cmd("rename-column", *base,
                      "--from", "measurement_value", "--to", "reading")
    assert rc == 0 and out[0] == {
        "table": ctl.table_name, "commit": out[0]["commit"],
        "from": "measurement_value", "to": "reading"}
    rc, out = run_cmd("drop-column", *base, "--column", "measurement_date")
    assert rc == 0 and out[0]["dropped"] == "measurement_date"
    rc, out = run_cmd("add-column", *base, "--column", "tier",
                      "--type", "string", "--default", "legacy")
    assert rc == 0 and out[0]["column"] == "tier" \
        and out[0]["default"] == "legacy"
    from glue_hudi_spark.pipeline import CdcPipeline
    pipe = CdcPipeline(spark, tmp_path / "raw", tmp_path / "curated")
    snap = pipe._table(ctl).read_snapshot()
    assert "reading" in snap.columns
    assert "measurement_value" not in snap.columns
    assert "measurement_date" not in snap.columns
    assert {r["tier"] for r in snap.select("tier").collect()} == {"legacy"}


def test_cli_evolve_partition(spark, tmp_path, capsys):
    ctl = JobControl(**{**CONTROL,
                        "primary_key": "measurement_id",
                        "precombine_field": "measurement_date_time",
                        "partition_key": ""})
    control = tmp_path / "control.json"
    ControlStore(control).save([ctl])
    raw = tmp_path / "raw" / ctl.db_name / ctl.schema_name / ctl.table_name
    base = ["--control", str(control), "--curated", str(tmp_path / "curated")]

    def run_cmd(*argv):
        rc = main(list(argv))
        out = capsys.readouterr().out.strip().splitlines()[-1]
        return rc, json.loads(out)

    _land(make_full_load_df(spark), raw, "LOAD1")
    rc, _ = run_cmd("run", *base, "--raw", str(tmp_path / "raw"))
    assert rc == 0
    rc, out = run_cmd("evolve-partition", *base,
                      "--spec", "days(measurement_date_time)")
    assert rc == 0 and out[0]["to"] == ["days(measurement_date_time)"]
    from glue_hudi_spark.pipeline import CdcPipeline
    pipe = CdcPipeline(spark, tmp_path / "raw", tmp_path / "curated")
    table = pipe._table(ctl)
    assert table.partition_keys == ["days(measurement_date_time)"]
    assert table.read_snapshot().count() == 100


def test_cli_branch_tag_fast_forward(spark, tmp_path, capsys):
    ctl = JobControl(**{**CONTROL,
                        "primary_key": "measurement_id",
                        "precombine_field": "measurement_date_time",
                        "partition_key": ""})
    control = tmp_path / "control.json"
    ControlStore(control).save([ctl])
    raw = tmp_path / "raw" / ctl.db_name / ctl.schema_name / ctl.table_name
    base = ["--control", str(control), "--curated", str(tmp_path / "curated")]

    def run_cmd(*argv):
        rc = main(list(argv))
        out = capsys.readouterr().out.strip().splitlines()[-1]
        return rc, json.loads(out)

    _land(make_full_load_df(spark), raw, "LOAD1")
    rc, _ = run_cmd("run", *base, "--raw", str(tmp_path / "raw"))
    assert rc == 0
    rc, out = run_cmd("tag", *base, "--name", "v1")
    assert rc == 0 and out[0]["tag"] == "v1"
    rc, out = run_cmd("branch", *base, "--name", "staging")
    assert rc == 0 and out[0]["branch"] == "staging"
    from glue_hudi_spark.pipeline import CdcPipeline
    pipe = CdcPipeline(spark, tmp_path / "raw", tmp_path / "curated")
    table = pipe._table(ctl)
    b = table.branch("staging")
    b.delete(b.read_snapshot().select("measurement_id").limit(10))
    rc, out = run_cmd("fast-forward", *base, "--name", "staging", "--drop")
    assert rc == 0 and out[0]["fast_forward_of"] == "staging"
    assert table.read_snapshot().count() == 90
    assert table.read_snapshot(tag="v1").count() == 100
    rc, out = run_cmd("drop-tag", *base, "--name", "v1")
    assert rc == 0 and out[0]["dropped_tag"] == "v1"


def test_cli_expire_snapshots(spark, tmp_path, capsys):
    import time as _time

    ctl = JobControl(**CONTROL)
    control = tmp_path / "control.json"
    ControlStore(control).save([ctl])
    raw = tmp_path / "raw" / ctl.db_name / ctl.schema_name / ctl.table_name
    base = ["--control", str(control), "--curated", str(tmp_path / "curated")]

    def run_cmd(*argv):
        rc = main(list(argv))
        out = capsys.readouterr().out.strip().splitlines()[-1]
        return rc, json.loads(out)

    _land(make_full_load_df(spark), raw, "LOAD1")
    run_cmd("run", *base, "--raw", str(tmp_path / "raw"))
    _land(make_cdc_df(spark), raw, "CDC1")
    run_cmd("run", *base, "--raw", str(tmp_path / "raw"))
    rc, out = run_cmd("expire", *base,
                      "--older-than", str(_time.time() + 10),
                      "--retain-last", "1")
    assert rc == 0 and out[0]["expired"]
    from glue_hudi_spark.pipeline import CdcPipeline
    pipe = CdcPipeline(spark, tmp_path / "raw", tmp_path / "curated")
    table = pipe._table(ctl)
    assert len(table.timeline.history()) == 1
    assert table.read_snapshot().count() == 190


def test_cli_inspect(spark, tmp_path, capsys):
    ctl = JobControl(**CONTROL)
    control = tmp_path / "control.json"
    ControlStore(control).save([ctl])
    raw = tmp_path / "raw" / ctl.db_name / ctl.schema_name / ctl.table_name
    base = ["--control", str(control), "--curated", str(tmp_path / "curated")]

    def run_cmd(*argv):
        rc = main(list(argv))
        out = capsys.readouterr().out.strip().splitlines()[-1]
        return rc, json.loads(out)

    _land(make_full_load_df(spark), raw, "LOAD1")
    run_cmd("run", *base, "--raw", str(tmp_path / "raw"))
    rc, out = run_cmd("inspect", *base, "--kind", "files")
    assert rc == 0
    assert sum(r["rows"] for r in out[0]["rows"]) == 100
    rc, out = run_cmd("inspect", *base, "--kind", "refs")
    assert rc == 0 and out[0]["rows"] == []


def test_cli_maintain(spark, tmp_path, capsys):
    ctl = JobControl(**{**CONTROL, "hudi_storage_type": "mor"})
    control = tmp_path / "control.json"
    ControlStore(control).save([ctl])
    raw = tmp_path / "raw" / ctl.db_name / ctl.schema_name / ctl.table_name
    base = ["--control", str(control), "--curated", str(tmp_path / "curated")]

    def run_cmd(*argv):
        rc = main(list(argv))
        out = capsys.readouterr().out.strip().splitlines()[-1]
        return rc, json.loads(out)

    _land(make_full_load_df(spark), raw, "LOAD1")
    run_cmd("run", *base, "--raw", str(tmp_path / "raw"))
    _land(make_cdc_df(spark), raw, "CDC1")
    run_cmd("run", *base, "--raw", str(tmp_path / "raw"))
    rc, out = run_cmd("maintain", *base)
    assert rc == 0 and out[0]["ok"]
    assert "compacted" in out[0]  # the MoR deltas got folded
    from glue_hudi_spark.pipeline import CdcPipeline
    pipe = CdcPipeline(spark, tmp_path / "raw", tmp_path / "curated")
    table = pipe._table(ctl)
    assert not table.timeline.latest().deltas
    assert table.read_snapshot().count() == 190


def test_cli_release_lifecycle(spark, tmp_path, capsys):
    ctl = JobControl(**CONTROL)
    control = tmp_path / "control.json"
    ControlStore(control).save([ctl])
    raw = tmp_path / "raw" / ctl.db_name / ctl.schema_name / ctl.table_name
    base = ["--control", str(control), "--curated", str(tmp_path / "curated")]

    def run_cmd(*argv):
        rc = main(list(argv))
        out = capsys.readouterr().out.strip().splitlines()[-1]
        return rc, json.loads(out)

    _land(make_full_load_df(spark), raw, "LOAD1")
    run_cmd("run", *base, "--raw", str(tmp_path / "raw"))
    rc, out = run_cmd("release", *base, "--name", "train-v1")
    assert rc == 0 and ctl.table_name in out["tables"]
    _land(make_cdc_df(spark), raw, "CDC1")
    run_cmd("run", *base, "--raw", str(tmp_path / "raw"))
    from glue_hudi_spark.storage import release as REL
    loaded = REL.load_release(spark, tmp_path / "curated", "train-v1")
    assert loaded[ctl.table_name].count() == 100  # pre-CDC pin
    rc, out = run_cmd("drop-release", *base, "--name", "train-v1")
    assert rc == 0 and out["dropped_release"] == "train-v1"


def test_cli_sql_end_to_end(tmp_path, capsys):
    """`python -m glue_hudi_spark sql --warehouse W "stmts"`: the SQL
    entry as an operational command — create + write in one invocation,
    read back in a SECOND invocation (durable catalog rediscovers)."""
    import json as _json

    from glue_hudi_spark.__main__ import main

    wh = tmp_path / "wh"
    rc = main(["sql", "--warehouse", str(wh),
               "CREATE TABLE t (id STRING, v INT) USING ghs_table "
               "TBLPROPERTIES ('primaryKey'='id'); "
               "INSERT INTO t VALUES ('a', 1), ('b', 2)"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert _json.loads(out[-1]) == {"ok": True, "tables": ["t"]}

    rc = main(["sql", "--warehouse", str(wh),
               "UPDATE t SET v = v + 10 WHERE id = 'a'",
               "SELECT id, v FROM t ORDER BY id"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    rows = [_json.loads(l) for l in out[:-1]]
    assert rows == [{"id": "a", "v": 11}, {"id": "b", "v": 2}]

    rc = main(["sql", "--warehouse", str(wh), "FROBNICATE t"])
    assert rc == 2
    assert "error" in _json.loads(capsys.readouterr().out.strip())


def test_bench_artifact_name_guards_non_default_sf(tmp_path):
    """A bench run at a non-default SF must not overwrite the round
    artifact BENCH_local_r{N}.json (round-10 verdict #6)."""
    import bench

    (tmp_path / "BENCH_r07.json").write_text("{}")
    (tmp_path / "BENCH_r10.json").write_text("{}")
    assert bench.local_artifact_name(str(tmp_path), "0.1") == \
        "BENCH_local_r11.json"
    assert bench.local_artifact_name(str(tmp_path), "0.001") == \
        "BENCH_local_r11_sf0.001.json"
    assert bench.local_artifact_name(str(tmp_path), "0.01") == \
        "BENCH_local_r11_sf0.01.json"
