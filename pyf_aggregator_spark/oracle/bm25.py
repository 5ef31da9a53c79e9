"""Single-node NumPy BM25 oracle — the "reference engine".

Defines the golden top-k (rank, doc_id, score) the Spark engine must
match rank-identically (BASELINE.json north_rule). Mirrors the
reference's live-oracle test pattern (tests/test_live_pypi_sorting.py:
115-166): an independent implementation of the same semantics, used
only to judge the engine.

Deliberately simple and auditable: dict-of-arrays index, float64 math,
same tokenizer, same idf variant, same (round(score,4) desc, doc_id asc)
tie-break as search/engine.py.
"""

from __future__ import annotations

from collections import Counter, defaultdict
from dataclasses import dataclass, field

import numpy as np

from pyf_aggregator_spark import B, K1
from pyf_aggregator_spark.functions.tokenize import tokenize_py
from pyf_aggregator_spark.search.engine import SCORE_DECIMALS


@dataclass
class NumpyBM25:
    doc_ids: list[int] = field(default_factory=list)
    doc_len: dict[int, int] = field(default_factory=dict)
    # term -> {doc_id: tf}
    postings: dict[str, dict[int, int]] = field(default_factory=lambda: defaultdict(dict))

    @classmethod
    def fit(cls, docs: list[tuple[int, str]]) -> "NumpyBM25":
        self = cls()
        for doc_id, text in docs:
            toks = tokenize_py(text or "")
            self.doc_ids.append(doc_id)
            self.doc_len[doc_id] = len(toks)
            for term, tf in Counter(toks).items():
                self.postings[term][doc_id] = tf
        return self

    @property
    def n_docs(self) -> int:
        return len(self.doc_ids)

    @property
    def avgdl(self) -> float:
        return sum(self.doc_len.values()) / self.n_docs

    def idf(self, term: str) -> float:
        df = len(self.postings.get(term, {}))
        return float(np.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5)))

    def topk(self, query: str, k: int = 10, mode: str = "or") -> list[tuple[int, int, float]]:
        """→ [(rank, doc_id, score)] with the engine's exact tie-break."""
        terms = sorted(set(tokenize_py(query)))
        if not terms:
            return []
        avgdl = self.avgdl
        scores: dict[int, float] = defaultdict(float)
        nmatch: dict[int, int] = defaultdict(int)
        for term in terms:
            plist = self.postings.get(term, {})
            w = self.idf(term)
            for doc_id, tf in plist.items():
                dl = self.doc_len[doc_id]
                scores[doc_id] += w * (tf * (K1 + 1.0)) / (
                    tf + K1 * (1.0 - B + B * dl / avgdl)
                )
                nmatch[doc_id] += 1
        if mode == "and":
            scores = {d: s for d, s in scores.items() if nmatch[d] == len(terms)}
        rounded = [(d, round(s, SCORE_DECIMALS)) for d, s in scores.items()]
        rounded.sort(key=lambda x: (-x[1], x[0]))
        return [(rank + 1, d, s) for rank, (d, s) in enumerate(rounded[:k])]
