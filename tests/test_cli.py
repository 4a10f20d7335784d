"""CLI surface (reference: sequence_etl.rs + toml_etl.rs binaries):
--only/--skip/--dry-run existed since r1; this adds --lookup-files
(domain/ports.rs:17, extension allow-list config/mod.rs:75-77) and
--mvp (toml_etl.rs:54-57 first_record_only override)."""

from __future__ import annotations

import json

import pytest

from small_etl_spark.cli import main

CONFIG = """
[[pipelines]]
name = "base"
[pipelines.source]
type = "sample"
sample_data = [
  {id = 1, name = "a", value = 10},
  {id = 2, name = "b", value = 25},
  {id = 3, name = "c", value = 30},
]
[pipelines.transform]
add_markers = false

[[pipelines]]
name = "enriched"
depends_on = ["base"]
[pipelines.source]
type = "previous"
previous_pipeline = "lookup_users"
[pipelines.transform]
add_markers = false
"""


@pytest.fixture()
def config_path(tmp_path):
    p = tmp_path / "seq.toml"
    p.write_text(CONFIG)
    return str(p)


@pytest.fixture()
def lookup_csv(tmp_path):
    p = tmp_path / "lookup_users.csv"
    p.write_text("user_id,role\n1,admin\n2,viewer\n")
    return str(p)


def test_cli_lookup_files_preloaded_as_stage(spark, config_path, lookup_csv, capsys):
    rc = main(["sequence", config_path, "--lookup-files", lookup_csv])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out)
    # 2 lookup rows consumed by 'enriched' via the preloaded catalog
    # entry + 3 base rows + lookup stage itself
    assert summary["total_records"] == 2 + 3 + 2
    assert "lookup_users" in summary["pipeline_names"]


def test_cli_lookup_files_bad_extension_is_config_error(config_path, tmp_path, capsys):
    bad = tmp_path / "lookup_users.parquet"
    bad.write_bytes(b"PAR1")
    rc = main(["sequence", config_path, "--lookup-files", str(bad)])
    assert rc == 1
    assert "lookup_files" in capsys.readouterr().err


def test_cli_mvp_limits_every_stage_to_first_record(spark, config_path, lookup_csv, capsys):
    rc = main(["sequence", config_path, "--lookup-files", lookup_csv, "--mvp"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out)
    # MVP mode: base and enriched each keep 1 record (the preloaded
    # lookup stage is a catalog entry, not an executed stage)
    assert summary["total_records"] == 2 + 1 + 1

    rc = main(["sequence", config_path, "--lookup-files", lookup_csv, "--no-mvp"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out)
    assert summary["total_records"] == 2 + 3 + 2


def test_all_example_configs_parse_and_dry_run(capsys):
    """Every shipped example config must parse and pass --dry-run
    validation — a user can trust configs/ as working references."""
    import os

    from small_etl_spark.cli import main

    for cfg in sorted(os.listdir("configs")):
        sub = "run" if cfg == "mvp-simple.toml" else "sequence"
        rc = main([sub, os.path.join("configs", cfg), "--dry-run"])
        out = capsys.readouterr().out
        assert rc == 0, (cfg, out)
        assert "DRY RUN" in out or "dry" in out.lower(), cfg


def test_table_admin_cli(spark, tmp_path, capsys):
    import json as _json

    from pyspark.sql import functions as F

    from small_etl_spark.cli import main
    from small_etl_spark.sinks import versioned as V

    table = str(tmp_path / "tbl")
    V.commit_snapshot(
        spark.range(0, 20).select(F.col("id").alias("k")).repartition(4),
        table,
        mode="overwrite",
    )
    V.commit_snapshot(
        spark.range(20, 25).select(F.col("id").alias("k")),
        table,
        mode="append",
    )
    assert main(["table", table, "history"]) == 0
    lines = [
        _json.loads(ln)
        for ln in capsys.readouterr().out.strip().splitlines()
    ]
    assert [r["snapshot"] for r in lines] == [0, 1]
    assert lines[1]["n_rows"] == 25

    assert main(["table", table, "optimize"]) == 0
    out = _json.loads(capsys.readouterr().out.strip())
    assert out["new_version"] == 2

    assert main(["table", table, "vacuum", "--keep-last", "1"]) == 0
    out = _json.loads(capsys.readouterr().out.strip())
    assert out["deleted_files"] >= 0
    assert V.read_snapshot(spark, table).count() == 25

    # tag admin: pin, list, protect is exercised in test_versioned;
    # here the CLI surface round-trips
    assert main(["table", table, "tag", "--name", "run1"]) == 0
    out = _json.loads(capsys.readouterr().out.strip())
    assert out == {"tag": "run1", "version": 2}
    assert main(["table", table, "tags"]) == 0
    assert _json.loads(capsys.readouterr().out.strip()) == {"run1": 2}
    assert main(["table", table, "untag", "--name", "run1"]) == 0
    capsys.readouterr()
    assert main(["table", table, "tag"]) == 1  # --name required

    assert main(["table", str(tmp_path / "missing"), "history"]) == 1


def test_table_admin_round8_actions(spark, tmp_path, capsys):
    import json as _json

    from pyspark.sql import functions as F

    from small_etl_spark.cli import main
    from small_etl_spark.sinks import versioned as V

    tbl = str(tmp_path / "tbl")
    V.commit_snapshot(
        spark.range(50).select(F.col("id").alias("k")), tbl,
        mode="overwrite",
    )
    assert main(["table", tbl, "report"]) == 0
    rep = _json.loads(capsys.readouterr().out.strip())
    assert rep["n_rows"] == 50 and "recommendations" in rep
    # branch lifecycle through the CLI
    br = V.branch_create(tbl, "stage")
    V.commit_snapshot(
        spark.range(50, 60).select(F.col("id").alias("k")), br,
        mode="append",
    )
    assert main(["table", tbl, "branches"]) == 0
    assert "stage" in _json.loads(capsys.readouterr().out.strip())
    assert main(["table", tbl, "publish", "--name", "stage"]) == 0
    out = _json.loads(capsys.readouterr().out.strip())
    assert out == {"published_branch": "stage", "version": 1}
    assert V.read_snapshot(spark, tbl).count() == 60
    assert main(["table", tbl, "abandon", "--name", "stage"]) == 0
    capsys.readouterr()
    assert V.list_branches(tbl) == {}
    # compactions report their new version (or null no-op)
    V.delete_where_mor(spark, tbl, F.col("k") < 5)
    assert main(["table", tbl, "compact-dv"]) == 0
    assert _json.loads(capsys.readouterr().out.strip())["new_version"] == 3
    assert main(["table", tbl, "compact-eq"]) == 0
    assert (
        _json.loads(capsys.readouterr().out.strip())["new_version"] is None
    )


def test_table_admin_round9_evolution_actions(spark, tmp_path, capsys):
    """CLI surface for the r9 evolution ops + auto-maintain: each a
    metadata-only commit reported as one JSON line."""
    import json as _json

    from pyspark.sql import functions as F

    from small_etl_spark.cli import main
    from small_etl_spark.sinks import versioned as V

    tbl = str(tmp_path / "tbl")
    V.commit_snapshot(
        spark.range(0, 30).select(
            F.col("id").alias("k"),
            (F.col("id") * 2).cast("int").alias("x"),
        ).repartition(12),
        tbl,
        mode="overwrite",
    )
    assert main(["table", tbl, "rename-column",
                 "--column", "x", "--to", "score"]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["renamed"] == ["x", "score"] and out["version"] == 1
    assert main(["table", tbl, "widen-type",
                 "--column", "score", "--to", "long"]) == 0
    capsys.readouterr()
    assert main(["table", tbl, "add-column",
                 "--column", "lang", "--to", "string",
                 "--default", "en"]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["added"] == ["lang", "string"] and out["default"] == "en"
    got = V.read_snapshot(spark, tbl)
    assert got.columns == ["k", "score", "lang"]
    assert got.filter(F.col("lang") == "en").count() == 30
    assert main(["table", tbl, "drop-column", "--column", "lang"]) == 0
    capsys.readouterr()
    assert V.read_snapshot(spark, tbl).columns == ["k", "score"]
    # validation errors surface as exit 1, not tracebacks
    assert main(["table", tbl, "rename-column", "--column", "x"]) == 1
    capsys.readouterr()
    # auto-maintain compacts the fragmented layout in one call
    assert main(["table", tbl, "auto-maintain"]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["actions"] == ["optimize"] and not out["conflict"]
    assert V.read_snapshot(spark, tbl).count() == 30


def test_table_admin_restore_orphans_files_partitions(
    spark, tmp_path, capsys
):
    """CLI surface for RESTORE, orphan GC, and the $files/$partitions
    metadata tables — each one JSON line per row/op."""
    import json as _json

    from pyspark.sql import functions as F

    from small_etl_spark.cli import main
    from small_etl_spark.sinks import versioned as V

    tbl = str(tmp_path / "tbl")
    V.commit_snapshot(
        spark.range(0, 20).select(
            F.col("id").alias("k"), (F.col("id") % 2).alias("part")
        ),
        tbl, mode="overwrite", partition_by=["part"],
    )
    V.delete_where(spark, tbl, F.col("part") == 1)

    assert main(["table", tbl, "restore", "--at-version", "0"]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == {"restored_from": 0, "version": 2}
    assert V.read_snapshot(spark, tbl).count() == 20

    # an abandoned write (lost commit race) becomes an orphan
    V._write_data_files(
        spark.range(0, 5).select(
            F.col("id").alias("k"), (F.col("id") % 2).alias("part")
        ),
        tbl, ["k"],
    )
    assert main(["table", tbl, "remove-orphans",
                 "--older-than-ms", "0", "--dry-run-orphans"]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["dry_run"] and len(out["orphans"]) >= 1
    assert main(["table", tbl, "remove-orphans",
                 "--older-than-ms", "0"]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert not out["dry_run"] and len(out["orphans"]) >= 1
    assert V.read_snapshot(spark, tbl).count() == 20

    assert main(["table", tbl, "files"]) == 0
    rows = [_json.loads(ln) for ln in
            capsys.readouterr().out.strip().splitlines()]
    assert sum(r["n_rows"] for r in rows) == 20

    assert main(["table", tbl, "partitions"]) == 0
    rows = [_json.loads(ln) for ln in
            capsys.readouterr().out.strip().splitlines()]
    got = {r["partition"]["part"]: r["n_rows"] for r in rows}
    assert got == {"0": 10, "1": 10}

    # restore without --at-version is a usage error, not a traceback
    assert main(["table", tbl, "restore"]) == 1
    capsys.readouterr()


def test_table_admin_constraints(spark, tmp_path, capsys):
    """CLI surface for CHECK constraints: add validates existing data,
    enforcement rejects violating appends, drop lifts it."""
    import json as _json

    from pyspark.sql import functions as F

    from small_etl_spark.cli import main
    from small_etl_spark.sinks import versioned as V

    tbl = str(tmp_path / "tbl")
    V.commit_snapshot(
        spark.range(0, 10).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        ),
        tbl, mode="overwrite",
    )
    assert main(["table", tbl, "add-constraint",
                 "--name", "v_nonneg", "--expr", "v >= 0"]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["added_constraint"] == "v_nonneg" and out["version"] == 1

    assert main(["table", tbl, "constraints"]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == {"v_nonneg": "v >= 0"}

    import pytest as _pytest
    with _pytest.raises(V.ConstraintViolation):
        V.commit_snapshot(
            spark.createDataFrame([(1, -1)], "k bigint, v bigint"),
            tbl, mode="append",
        )

    assert main(["table", tbl, "drop-constraint",
                 "--name", "v_nonneg"]) == 0
    capsys.readouterr()
    assert V.list_constraints(tbl) == {}
    # usage errors exit 1
    assert main(["table", tbl, "add-constraint", "--name", "x"]) == 1
    capsys.readouterr()


def test_table_admin_sql_statement(spark, tmp_path, capsys):
    """``table <path> sql --expr`` runs one statement (SELECT with AS
    OF, DML, maintenance) against the table registered as ``t``."""
    from small_etl_spark.sinks import versioned as V

    tbl = str(tmp_path / "tbl")
    V.commit_snapshot(
        spark.createDataFrame(
            [(1, 10), (2, 20)], "k bigint, v bigint"
        ),
        tbl, mode="overwrite",
    )
    assert main([
        "table", tbl, "sql",
        "--expr", "UPDATE t SET v = v + 1 WHERE k = 2",
    ]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["op"] == "update" and out["version"] == 1
    got = {r.k: r.v for r in V.read_snapshot(spark, tbl).collect()}
    assert got == {1: 10, 2: 21}

    assert main([
        "table", tbl, "sql",
        "--expr", "SELECT COUNT(*) AS n FROM t VERSION AS OF 0",
    ]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == {"n": 2}
    # usage error exits 1
    assert main(["table", tbl, "sql"]) == 1
    capsys.readouterr()
