"""Deterministic synthetic transcript corpus + reference query set.

Exactly the FIXTURES.md §1/§2 shape (BASELINE.json input_hint):
(conv_id string, turn_idx int32, role string, text string, tool string,
ts timestamp). Seed fixed → byte-identical across runs, which the
per-turn-text-equality and resume-identity invariants depend on.

Generation is vectorized numpy; materialization into Spark goes through
Arrow (spark.createDataFrame on a pandas frame) — no per-row Python.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

SEED = 42
VOCAB_SIZE = 20_000
ZIPF_S = 1.07
TOOLS = [f"tool_{i:02d}" for i in range(20)]
EPOCH = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)

# Planted needles for exact-hit tests: (conv index, turn_idx, phrase)
NEEDLES = [
    (3, 0, "quixotic zephyr marmalade"),
    (17, 2, "perihelion sonata quandary"),
]

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
    ]
)


def _zipf_probs(n: int, s: float) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    p = ranks**-s
    return p / p.sum()


def generate_transcripts(n_turns: int, seed: int = SEED) -> pd.DataFrame:
    """~n_turns rows of (conv_id, turn_idx, role, text, tool, ts)."""
    rng = np.random.default_rng(seed)
    probs = _zipf_probs(VOCAB_SIZE, ZIPF_S)

    # conversation lengths ~ LogNormal(2, 0.7) clamped [1, 64]
    approx_convs = max(1, int(n_turns / 8))
    lens = np.clip(
        np.round(rng.lognormal(2.0, 0.7, size=approx_convs * 2)).astype(np.int64),
        1,
        64,
    )
    cum = np.cumsum(lens)
    n_convs = int(np.searchsorted(cum, n_turns) + 1)
    lens = lens[:n_convs]
    total = int(lens.sum())

    conv_idx = np.repeat(np.arange(n_convs), lens)
    conv_id = np.char.add("conv-", np.char.zfill(conv_idx.astype(str), 8))
    turn_idx = (
        np.arange(total) - np.repeat(np.concatenate([[0], cum[: n_convs - 1]]), lens)
    ).astype(np.int32)

    is_tool = rng.random(total) < 0.15
    alt = np.where(turn_idx % 2 == 0, "user", "assistant")
    role = np.where(is_tool, "tool", alt)
    tool = np.where(
        is_tool, np.array(TOOLS)[rng.integers(0, len(TOOLS), total)], ""
    )

    # text: 5-120 Zipf tokens; p=0.05 of the tokens are separator compounds
    n_tok = rng.integers(5, 121, size=total)
    flat_n = int(n_tok.sum())
    words_idx = rng.choice(VOCAB_SIZE, size=flat_n, p=probs)
    words = np.char.add("w", np.char.zfill(words_idx.astype(str), 5))
    compound_mask = rng.random(flat_n) < 0.05
    seps = np.array([".", "-", "_", "@", "/"])
    comp_sep = seps[rng.integers(0, 5, flat_n)]
    comp_other = np.char.add(
        "w", rng.integers(0, 100, flat_n).astype(str)
    )
    words = np.where(
        compound_mask, np.char.add(np.char.add(words, comp_sep), comp_other), words
    )
    bounds = np.concatenate([[0], np.cumsum(n_tok)])
    texts = [" ".join(words[bounds[i] : bounds[i + 1]]) for i in range(total)]

    ts = np.array(
        [EPOCH + dt.timedelta(seconds=60 * int(i)) for i in range(total)],
        dtype=object,
    )

    pdf = pd.DataFrame(
        {
            "conv_id": conv_id,
            "turn_idx": turn_idx,
            "role": role,
            "text": texts,
            "tool": tool,
            "ts": ts,
        }
    )
    # plant needles at known (conv, turn) positions
    for ci, ti, phrase in NEEDLES:
        m = (conv_idx == ci) & (turn_idx == ti)
        pos = np.nonzero(m)[0]
        if len(pos):
            i = int(pos[0])
            pdf.loc[i, "text"] = pdf.loc[i, "text"] + " " + phrase
    return pdf


def transcripts_df(spark: SparkSession, n_turns: int, seed: int = SEED) -> DataFrame:
    pdf = generate_transcripts(n_turns, seed)
    return spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA)


def bench_query_set(n: int = 200, seed: int = 7) -> list[dict]:
    """Seeded synthetic query workload for THROUGHPUT measurement (the
    15-query reference set stays the correctness gate; 200 queries let
    per-job scheduling cost amortize so q/s reflects engine capacity)."""
    rng = np.random.default_rng(seed)
    probs = _zipf_probs(VOCAB_SIZE, ZIPF_S)
    qs = []
    for i in range(n):
        n_terms = int(rng.integers(1, 4))
        terms = [
            f"w{int(t):05d}" for t in rng.choice(VOCAB_SIZE, n_terms, p=probs)
        ]
        qs.append(
            {
                "query_id": f"b{i:04d}",
                "query": " ".join(terms),
                "mode": "and" if rng.random() < 0.4 else "or",
                "k": 10,
            }
        )
    return qs


def reference_queries() -> list[dict]:
    """The fixed reference query set (FIXTURES.md §2)."""
    qs: list[dict] = []
    # single rare terms (Zipf tail) and hot terms (head)
    for i, t in enumerate(["w19231", "w17777", "w15003"]):
        qs.append({"query_id": f"q{len(qs):03d}", "query": t, "mode": "or", "k": 10})
    for t in ["w00000", "w00001", "w00002"]:
        qs.append({"query_id": f"q{len(qs):03d}", "query": t, "mode": "or", "k": 10})
    # conjunctions mixing hot+rare
    for q in ["w00000 w01234", "w00001 w05000 w00010", "w00003 w12000"]:
        qs.append({"query_id": f"q{len(qs):03d}", "query": q, "mode": "and", "k": 10})
    # disjunctions
    for q in ["w00005 w09999", "w00007 w00042 w13000"]:
        qs.append({"query_id": f"q{len(qs):03d}", "query": q, "mode": "or", "k": 10})
    # separator-containing query (tokenizer must split it)
    qs.append({"query_id": f"q{len(qs):03d}", "query": "w00012.w87", "mode": "or", "k": 10})
    # zero-hit
    qs.append({"query_id": f"q{len(qs):03d}", "query": "zzzznothing", "mode": "or", "k": 10})
    # planted needle phrases
    qs.append({"query_id": f"q{len(qs):03d}", "query": "quixotic zephyr marmalade", "mode": "and", "k": 10})
    qs.append({"query_id": f"q{len(qs):03d}", "query": "perihelion sonata quandary", "mode": "and", "k": 10})
    return qs
