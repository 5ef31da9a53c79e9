"""Tokenizer parity: JVM column expression ≡ python reference.

Semantics from the reference's token_separators (db.py:241).
"""

from __future__ import annotations

from pyf_aggregator_spark.functions.tokenize import tokenize_col, tokenize_py

CASES = [
    "plone.api",
    "@plone/volto",
    "Flask-RESTful stuff_here",
    "a.b-c_d@e/f",
    "  leading and   trailing  ",
    "",
    "...",
    "MiXeD Case TEXT",
    "w00012.w87 plain w5",
]


def test_python_tokenizer():
    assert tokenize_py("plone.api") == ["plone", "api"]
    assert tokenize_py("@plone/volto") == ["plone", "volto"]
    assert tokenize_py("Flask-RESTful") == ["flask", "restful"]
    assert tokenize_py("") == []
    assert tokenize_py("...") == []
    assert tokenize_py("A  b") == ["a", "b"]


def test_spark_matches_python(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(CASES)], "i int, s string")
    got = {
        r["i"]: r["toks"]
        for r in df.select("i", tokenize_col("s").alias("toks")).collect()
    }
    for i, s in enumerate(CASES):
        assert got[i] == tokenize_py(s), f"case {s!r}"
