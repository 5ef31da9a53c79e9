"""jobs.py — the spark-submit surface (north rule: "run via
spark-submit --py-files"). One subprocess per command keeps this a true
CLI test; trimmed to three commands to stay inside the CI budget (the
deeper maintenance paths are pytest-gated at the library level)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(*args: str) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs.py"), *args],
        capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    from pyf_aggregator_spark.fixtures.transcripts import transcripts_df

    p = str(tmp_path_factory.mktemp("clicorpus") / "transcripts")
    transcripts_df(spark, 300).write.mode("overwrite").parquet(p)
    return p


def test_cli_build_then_query(corpus, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("cliidx") / "index")
    built = run_cli(
        "build", "--input", corpus, "--index-dir", idx, "--partitions", "2"
    )
    assert built["cmd"] == "build" and built["n_parts"] == 2
    q = run_cli(
        "query", "--index-dir", idx, "--query", "w00000 w00001", "--k", "5"
    )
    assert q["cmd"] == "query" and len(q["hits"]) == 5
    # ranked output: scores non-increasing, doc_id tie-break ascending
    scores = [h[1] for h in q["hits"]]
    assert scores == sorted(scores, reverse=True)


def test_cli_search_endpoint():
    res = run_cli(
        "search", "--sf-dir", "/root/testdata/sf0.001",
        "--q", "spark vector", "--filter-by", "lang:=en",
        "--facet-by", "lang", "--per-page", "3",
    )
    assert res["cmd"] == "search"
    assert len(res["hits"]) == 3
    assert all(h["document"]["lang"] == "en" for h in res["hits"])
    assert res["facet_counts"][0]["field_name"] == "lang"


def test_cli_search_curation_and_infix():
    base = run_cli(
        "search", "--sf-dir", "/root/testdata/sf0.001",
        "--q", "spark vector", "--per-page", "3", "--num-typos", "0",
    )
    top = [h["document"]["doc_id"] for h in base["hits"]]
    res = run_cli(
        "search", "--sf-dir", "/root/testdata/sf0.001",
        "--q", "spark vector", "--per-page", "3", "--num-typos", "0",
        "--hidden-hits", str(top[0]),
        "--pinned-hits", f"{top[2]}:1",
    )
    got = [h["document"]["doc_id"] for h in res["hits"]]
    assert got[0] == top[2] and top[0] not in got
    assert res["hits"][0].get("curated") is True
    # infix through the CLI: a within-word token finds hits
    inf = run_cli(
        "search", "--sf-dir", "/root/testdata/sf0.001",
        "--q", "ecto", "--per-page", "3", "--num-typos", "0",
        "--infix", "fallback",
    )
    assert inf["found"] > 0 and len(inf["hits"]) == 3
