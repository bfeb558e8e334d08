"""CLI round trip — the reference's three actions through the argv surface
(cmd/mover/main.go:70-93)."""

import json
import os

from mover_spark.cli import main

from .conftest import SF_DIR


def test_cli_version(capsys):
    assert main(["-version"]) == 0
    assert capsys.readouterr().out.strip()


def test_cli_describe(spark, capsys):
    assert main(["-action", "describe", "-table", "region", "-sf-dir", SF_DIR]) == 0
    desc = json.loads(capsys.readouterr().out)
    assert {d["column_name"] for d in desc} >= {"r_regionkey", "r_name"}


def test_cli_extract_then_load(spark, tmp_path, capsys):
    # default extract is the scale-safe partitioned envelope layout
    out = str(tmp_path / "ext")
    assert main([
        "-action", "extract", "-path", out,
        "-query", "SELECT * FROM region WHERE r_regionkey <= 1",
        "-sf-dir", SF_DIR,
    ]) == 0
    assert os.path.exists(os.path.join(out, "region", "_envelope.json"))
    assert main([
        "-action", "load", "-path", out, "-sf-dir", SF_DIR,
        "-on-conflict", "update",
    ]) == 0
    assert os.path.exists(os.path.join(out + "_loaded", "region.parquet"))


def test_cli_extract_single_file_parity(spark, tmp_path, capsys):
    # -single-file keeps byte-level parity with the reference envelope
    out = str(tmp_path / "ext1")
    assert main([
        "-action", "extract", "-path", out, "-single-file",
        "-query", "SELECT * FROM region WHERE r_regionkey <= 1",
        "-sf-dir", SF_DIR,
    ]) == 0
    assert os.path.exists(os.path.join(out, "region.json"))
    with open(os.path.join(out, "region.json")) as f:
        env = json.load(f)
    assert env["table_name"] == "region"
    assert env["count"] == len(env["data"])
