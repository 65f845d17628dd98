"""CLI surface test: gen → extract → oracle → eval → export as real
subprocesses (the exact spark-submit-shaped path operators run), including
eval's nonzero exit on mismatch. Subprocesses keep each command's
SparkSession lifecycle away from the shared test session."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*args: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-m", "ai_invoice_ocr_engine_spark", *args],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=420,
    )


def test_cli_end_to_end(tmp_path):
    corpus = str(tmp_path / "corpus")
    out = str(tmp_path / "out")
    golden = str(tmp_path / "golden.parquet")

    r = _run("gen", "--out", corpus, "--docs", "40", "--max-side", "320")
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads(r.stdout.splitlines()[-1])["n_docs"] == 40

    r = _run(
        "extract", "--docs", f"{corpus}/documents.parquet",
        "--media", f"{corpus}/media.parquet", "--out", out,
        "--buckets", "4", "--master", "local[4]",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads(r.stdout.splitlines()[-1])["docs"] == 40

    r = _run(
        "oracle", "--docs", f"{corpus}/documents.parquet",
        "--media", f"{corpus}/media.parquet", "--out", golden,
    )
    assert r.returncode == 0, r.stderr[-2000:]

    r = _run("eval", "--spans", f"{out}/spans", "--golden", golden,
             "--master", "local[4]")
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(r.stdout.splitlines()[-1])
    assert rep["n_docs"] == rep["n_equal"] == 40 and rep["rec"]["cer"] == 0.0

    r = _run("export", "--spans", f"{out}/spans", "--out", str(tmp_path / "ex"),
             "--format", "txt", "--master", "local[4]")
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads(r.stdout.splitlines()[-1])["docs"] == 40

    r = _run("export", "--spans", f"{out}/spans",
             "--out", str(tmp_path / "ex.xlsx"),
             "--format", "xlsx", "--master", "local[4]")
    assert r.returncode == 0, r.stderr[-2000:]
    import zipfile

    assert zipfile.is_zipfile(tmp_path / "ex.xlsx")

    r = _run("verify-lineage", "--out", out, "--master", "local[4]")
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads(r.stdout.splitlines()[-1])["ok"] is True

    # S9 viz sink, both modes (reference cli.py:40-43 --visualize loop)
    vdir = tmp_path / "viz"
    r = _run("viz", "--media", f"{corpus}/media.parquet", "--out", str(vdir),
             "--limit", "3", "--master", "local[4]")
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(r.stdout.splitlines()[-1])
    assert rep["frames"] == 3 and rep["boxes"] > 0
    assert len(list(vdir.glob("*.png"))) == 3

    r = _run("viz", "--media", f"{corpus}/media.parquet", "--out", str(vdir),
             "--limit", "2", "--labels", "--master", "local[4]")
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads(r.stdout.splitlines()[-1])["frames"] == 2
    assert len(list(vdir.glob("*_vis.png"))) == 2


def test_upsert_delete_requires_where(tmp_path):
    """ADVICE r3: `upsert --delete` with the default empty --where selects
    EVERY doc — refuse before any Spark work unless --all-docs confirms."""
    r = _run(
        "upsert", "--out", str(tmp_path / "nope"), "--docs",
        str(tmp_path / "nope.parquet"), "--delete",
    )
    assert r.returncode == 2
    assert "--all-docs" in r.stderr
    # the guard fires before a SparkSession ever starts (fast + no side
    # effects on the table); a bogus --docs path would otherwise error later
    assert "SparkSession" not in r.stderr


def test_cfg_flags_mapping():
    """--decode/--beam-width/--no-orient/--no-cls map onto the nested
    frozen config exactly (shared by extract and oracle so goldens can't
    diverge by config drift)."""
    import argparse

    from ai_invoice_ocr_engine_spark.__main__ import _add_cfg_flags, _cfg_from

    p = argparse.ArgumentParser()
    _add_cfg_flags(p)
    cfg = _cfg_from(p.parse_args([]))
    assert cfg.rec.decode == "greedy" and cfg.prep.ori and cfg.cls.en
    cfg2 = _cfg_from(p.parse_args(
        ["--decode", "beam", "--beam-width", "2", "--no-orient", "--no-cls"]
    ))
    assert cfg2.rec.decode == "beam" and cfg2.rec.beam_width == 2
    assert not cfg2.prep.ori and not cfg2.cls.en
