"""Pure-Python model of the unified search facade — a THIRD
implementation (next to the Spark engine and the DuckDB oracle SQL)
used for differential fuzzing in test_facade_fuzz.py.

Independent by construction: no imports from the engine beyond nothing —
tokenizer, BM25, typo/prefix/infix expansion, slot scoring, filter
algebra, grouping, facets, curation and paging are all re-derived here
from the documented semantics (api.py docstrings, wand.py kernel
contracts, the reference's Typesense defaults). The only shared
convention is the deterministic rounding contract: Spark's F.round =
BigDecimal HALF_UP over the double's shortest decimal representation,
reproduced with decimal.Decimal(repr(x)).

Mirrors the facade's control flow branch for branch (match-all →
ranked sort_by → grouped → top-k + curation) so a fuzz draw exercises
the same path on both sides.
"""

from __future__ import annotations

import math
import re
from decimal import ROUND_HALF_UP, Decimal
from functools import cmp_to_key

K1, B = 1.2, 0.75
_QUANT = Decimal("0.0001")
MAX_EXPANSIONS = 50
MIN_LEN_1TYPO, MIN_LEN_2TYPO, MAX_TERM_LEN = 4, 7, 32
FIVE_FIELDS = ("name", "title", "first_chapter", "main_content", "changelog")

_SEP = re.compile(r"[\s.\-_@/]+")


def rnd(x: float) -> float:
    """Spark F.round semantics: HALF_UP over repr(double)."""
    return float(Decimal(repr(float(x))).quantize(_QUANT, rounding=ROUND_HALF_UP))


def tokenize(text: str | None) -> list[str]:
    return [t for t in _SEP.split((text or "").lower()) if t]


def levenshtein(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _allowed_typos(length: int) -> int:
    if length >= MIN_LEN_2TYPO:
        return 2
    if length >= MIN_LEN_1TYPO:
        return 1
    return 0


class FieldIndex:
    """Postings + BM25 stats over one field, from per-doc token lists.
    N counts every doc (empty fields included), avgdl = total/N —
    the engine/oracle definition."""

    def __init__(self, tokens_by_doc: dict[int, list[str]]):
        self.dl = {d: len(toks) for d, toks in tokens_by_doc.items()}
        self.n_docs = len(tokens_by_doc)
        total = sum(self.dl.values())
        self.avgdl = total / self.n_docs if self.n_docs else 0.0
        self.tf: dict[str, dict[int, int]] = {}
        for d, toks in tokens_by_doc.items():
            for t in toks:
                self.tf.setdefault(t, {})[d] = self.tf.get(t, {}).get(d, 0) + 1
        self.df = {t: len(p) for t, p in self.tf.items()}

    def idf(self, term: str) -> float:
        df = self.df.get(term, 0)
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def contrib(self, term: str, doc: int, weight: float = 1.0) -> float:
        """BM25 contribution in the kernel's exact float operation
        order (_score_block: ((idf_eff · num) / denom), with the field
        weight folded into idf first on the multifield path)."""
        tf = self.tf.get(term, {}).get(doc)
        if not tf:
            return 0.0
        dl = self.dl[doc]
        idf_eff = self.idf(term) * weight if weight != 1.0 else self.idf(term)
        return idf_eff * (tf * (K1 + 1.0)) / (
            tf + K1 * (1.0 - B + B * dl / self.avgdl)
        )


def _mf_field_tokens(doc: dict) -> dict[str, list[str]]:
    """The engine's _five_field_docs split, re-derived: title=toks[0:3],
    first_chapter=toks[3:15], main_content=toks[15:], changelog =
    toks[max(len-4,16)-1:], name = tokenize(source)."""
    toks = tokenize(doc.get("text"))
    return {
        "name": tokenize(doc.get("source")),
        "title": toks[0:3],
        "first_chapter": toks[3:15],
        "main_content": toks[15:],
        "changelog": toks[max(len(toks) - 4, 16) - 1 :],
    }


class FacadeModel:
    def __init__(self, docs: list[dict]):
        self.docs = {d["doc_id"]: dict(d) for d in docs}
        self.doc_cols = list(docs[0].keys())
        self.text_tokens = {d["doc_id"]: tokenize(d.get("text")) for d in docs}
        self.single = FieldIndex(dict(self.text_tokens))
        per_field: dict[str, dict[int, list[str]]] = {f: {} for f in FIVE_FIELDS}
        for d in docs:
            ft = _mf_field_tokens(d)
            for f in FIVE_FIELDS:
                per_field[f][d["doc_id"]] = ft[f]
        self.mf = {f: FieldIndex(toks) for f, toks in per_field.items()}
        # summed-df vocabulary (the facade's typo/expansion stats for
        # query_by searches)
        self.mf_df: dict[str, int] = {}
        for fi in self.mf.values():
            for t, df in fi.df.items():
                self.mf_df[t] = self.mf_df.get(t, 0) + df

    # ------------------------------------------------------------ util
    def _vocab_df(self, mf: bool) -> dict[str, int]:
        return self.mf_df if mf else self.single.df

    def _filter_ids(self, clauses) -> set[int]:
        out = set()
        for did, doc in self.docs.items():
            ok = True
            for field, vals, neg in clauses:
                v = doc.get(field)
                s = None if v is None else str(v)
                if neg:
                    if s is not None and s in vals:
                        ok = False
                else:
                    if s is None or s not in vals:
                        ok = False
            if ok:
                out.add(did)
        return out

    def _sort_rows(self, ids, sort_by: str | None):
        """Spark orderBy semantics: asc → NULLS FIRST, desc → NULLS
        LAST; doc_id asc is the appended tie-break."""
        keys = []
        if sort_by:
            for part in sort_by.split(","):
                part = part.strip()
                if not part:
                    continue
                field, _, direction = part.partition(":")
                keys.append((field.strip(), direction.strip() == "desc"))

        def cmp(a: int, b: int) -> int:
            for field, desc in keys:
                va, vb = self.docs[a].get(field), self.docs[b].get(field)
                if va == vb:
                    continue
                if va is None:
                    return 1 if desc else -1
                if vb is None:
                    return -1 if desc else 1
                if desc:
                    return -1 if va > vb else 1
                return -1 if va < vb else 1
            return -1 if a < b else (1 if a > b else 0)

        return sorted(ids, key=cmp_to_key(cmp))

    # ------------------------------------------------ typo / expansion
    def _correct(self, terms, num_typos: int, mf: bool):
        vocab = self._vocab_df(mf)
        out = {}
        for t in sorted(set(terms)):
            if t in vocab:
                out[t] = t
                continue
            budget = min(num_typos, _allowed_typos(len(t)))
            best = None
            for cand, df in vocab.items():
                if len(cand) > MAX_TERM_LEN:
                    continue
                if abs(len(cand) - len(t)) > budget:
                    continue
                lev = levenshtein(t, cand)
                if lev <= budget:
                    key = (lev, -df, cand)
                    if best is None or key < best:
                        best = key
            out[t] = best[2] if best else None
        return out

    def _expand(self, kind: str, token: str, mf: bool) -> list[str]:
        """vocabulary expansion, (df desc, term asc)-ranked, capped."""
        vocab = self._vocab_df(mf)
        if kind == "prefix":
            hits = [t for t in vocab if t.startswith(token)]
        else:  # infix
            hits = [t for t in vocab if token in t]
        hits.sort(key=lambda t: (-vocab[t], t))
        return hits[:MAX_EXPANSIONS]

    # ------------------------------------------------------- matching
    def _adjacent(self, did: int, phrase: list[str]) -> bool:
        """Independent adjacency derivation: the phrase is a CONTIGUOUS
        subsequence of the doc's token list (the engine verifies with a
        separator-class regex over raw text — equivalent under the
        tokenizer contract, derived differently on purpose)."""
        toks = self.text_tokens[did]
        n = len(phrase)
        return any(
            toks[i : i + n] == phrase for i in range(len(toks) - n + 1)
        )

    def _match_set(
        self, slots, mode: str, allowed, mf_weights, phrase=None
    ) -> set[int]:
        """Exact membership: a slot (token group) matches when ANY
        member term matches (any queried field, for mf); and-mode
        requires every group; ``phrase`` additionally requires
        adjacency in order."""
        n = len(slots)
        out = set()
        for did in self.docs:
            if allowed is not None and did not in allowed:
                continue
            if phrase is not None and not self._adjacent(did, phrase):
                continue
            hit = 0
            for group in slots:
                matched = False
                for t in group:
                    if mf_weights is not None:
                        if any(
                            self.mf[f].tf.get(t, {}).get(did)
                            for f in mf_weights
                        ):
                            matched = True
                            break
                    elif self.single.tf.get(t, {}).get(did):
                        matched = True
                        break
                if matched:
                    hit += 1
            if (mode == "and" and hit == n) or (mode != "and" and hit > 0):
                out.add(did)
        return out

    def _score(self, did: int, slots, mf_weights) -> float:
        """Slot-max scoring in the kernel's float-summation order:
        terms iterated sorted, slots accumulate max, then summed in
        first-seen slot order. Plain queries are singleton slots ≡ sum."""
        if mf_weights is None:
            members = sorted({t for g in slots for t in g})
            slot_ids: dict[str, list[int]] = {}
            for si, g in enumerate(slots):
                for t in dict.fromkeys(g):
                    slot_ids.setdefault(t, []).append(si)
            best: dict[int, float] = {}
            order: list[int] = []
            for t in members:
                c = self.single.contrib(t, did)
                if c <= 0.0:
                    continue
                for sid in slot_ids[t]:
                    if sid not in best:
                        best[sid] = 0.0
                        order.append(sid)
                    best[sid] = max(best[sid], c)
            acc = 0.0
            for sid in order:
                acc += best[sid]
            return acc
        # multifield: keys are field␟term sorted; slot = (field, group)
        fields = sorted(mf_weights)
        slot_ids = {}
        for si, g in enumerate(slots):
            for t in dict.fromkeys(g):
                slot_ids.setdefault(t, []).append(si)
        keys = []
        for f in fields:
            for t in sorted({t for g in slots for t in g}):
                if t in self.mf[f].df:
                    keys.append((f, t))
        keys.sort(key=lambda k: k[0] + "\x1f" + k[1])
        best = {}
        order = []
        for f, t in keys:
            c = self.mf[f].contrib(t, did, mf_weights[f])
            if c <= 0.0:
                continue
            for gi in slot_ids[t]:
                sid = (f, gi)
                if sid not in best:
                    best[sid] = 0.0
                    order.append(sid)
                best[sid] = max(best[sid], c)
        acc = 0.0
        for sid in order:
            acc += best[sid]
        return acc

    def _ranked(self, slots, mode, allowed, mf_weights, phrase=None):
        """→ ([{doc_id, score}] over the FULL match set, found)."""
        ids = self._match_set(slots, mode, allowed, mf_weights, phrase)
        rows = [
            {"doc_id": d, "score": rnd(self._score(d, slots, mf_weights))}
            for d in ids
        ]
        rows.sort(key=lambda r: (-r["score"], r["doc_id"]))
        return rows, len(ids)

    def _drop_cascade(self, terms, threshold, allowed, mf_weights):
        """Typesense's drop_tokens rule, shared by the top-k / sort_by /
        grouped paths: rightmost token dropped per retry until
        found >= threshold (single-token prefix unconditionally). →
        (surviving_terms, ranked_rows_of_survivors, found)."""
        cascade = list(terms)
        while True:
            eff = [[t] for t in dict.fromkeys(cascade)]
            rows_all, found = self._ranked(eff, "and", allowed, mf_weights)
            if len(cascade) == 1 or found >= threshold:
                return cascade, rows_all, found
            cascade = cascade[:-1]

    # ------------------------------------------------------- facets
    def _facets(self, facet_by, ids, facet_query, max_values):
        if not facet_by:
            return []
        fq_field = fq_prefix = None
        if facet_query:
            fq_field, _, fq_prefix = facet_query.partition(":")
            fq_field, fq_prefix = fq_field.strip(), fq_prefix.strip().lower()
        out = []
        for field in [f.strip() for f in facet_by.split(",") if f.strip()]:
            counts: dict = {}
            for did in ids:
                v = self.docs[did].get(field)
                if field == fq_field and fq_prefix:
                    if v is None or not str(v).lower().startswith(fq_prefix):
                        continue
                counts[v] = counts.get(v, 0) + 1
            ordered = sorted(
                counts.items(),
                key=lambda kv: (-kv[1], kv[0] is not None, kv[0]),
            )[:max_values]
            out.append(
                {
                    "field_name": field,
                    "counts": [{"value": v, "count": n} for v, n in ordered],
                }
            )
        return out

    # ------------------------------------------- split_join_tokens
    def _split_join_rewrite(self, toks, mf: bool):
        """Re-derived space-as-typo rewrite (documented rule, not an
        engine import): greedy left-to-right JOIN of adjacent tokens
        whose concatenation is a vocabulary term, then each UNKNOWN
        token SPLITS into the two-vocabulary-word pair maximizing
        min(df(l), df(r)) (ties: leftmost). None when unchanged."""
        df = self._vocab_df(mf)
        out, changed, i = [], False, 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] + toks[i + 1] in df:
                out.append(toks[i] + toks[i + 1])
                i += 2
                changed = True
                continue
            t = toks[i]
            if t not in df:
                best, best_key = None, -1
                for j in range(1, len(t)):
                    l, r = t[:j], t[j:]
                    if l in df and r in df and min(df[l], df[r]) > best_key:
                        best, best_key = (l, r), min(df[l], df[r])
                if best is not None:
                    out.extend(best)
                    i += 1
                    changed = True
                    continue
            out.append(t)
            i += 1
        return out if changed else None

    # ------------------------------------------------------- search
    def search(self, params: dict) -> dict:
        sj = str(params.get("split_join_tokens", "off")).lower()
        q = params.get("q", "*")
        if sj == "off" or q == "*" or '"' in q or not tokenize(q):
            return self._search_one(params)
        resp = None
        if sj == "fallback":
            resp = self._search_one(params)
            if resp.get("found", 0) > 0:
                return resp
        new = self._split_join_rewrite(
            tokenize(q), bool(params.get("query_by"))
        )
        if new is None:
            return resp if resp is not None else self._search_one(params)
        return self._search_one(
            {**params, "q": " ".join(new), "split_join_tokens": "off"}
        )

    def _search_one(self, params: dict) -> dict:
        q = params.get("q", "*")
        page = int(params.get("page", 1))
        per_page = int(params.get("per_page", 10))
        pinned = self._parse_pinned(params.get("pinned_hits"))
        hidden = self._parse_hidden(params.get("hidden_hits"))
        clauses = params.get("_clauses") or []
        max_facet_values = int(params.get("max_facet_values", 10))
        include = [
            f.strip()
            for f in str(params.get("include_fields") or "").split(",")
            if f.strip()
        ]
        exclude = [
            f.strip()
            for f in str(params.get("exclude_fields") or "").split(",")
            if f.strip()
        ]
        if exclude:
            include = [
                c for c in (include or self.doc_cols) if c not in set(exclude)
            ] or ["doc_id"]

        def doc_dict(did: int) -> dict:
            d = dict(self.docs[did])
            if include:
                d = {k: d.get(k) for k in dict.fromkeys(["doc_id"] + include)}
                if "doc_id" not in include:
                    d.pop("doc_id", None)
            return d

        filtered = self._filter_ids(clauses)

        # ------- match-all
        if q == "*" or not tokenize(q):
            group_by = params.get("group_by")
            if group_by:
                # the reference's maintenance walk: q="*" + group_by
                # (+ optional sort_by); groups ordered by first
                # occurrence in the global match-all ordering, nested
                # Typesense grouped_hits shape
                limit = int(params.get("group_limit", 1))
                ordered = self._sort_rows(filtered, params.get("sort_by"))
                groups: dict = {}
                order_keys = []
                for did in ordered:
                    gv = self.docs[did].get(group_by)
                    if gv not in groups:
                        groups[gv] = []
                        order_keys.append(gv)
                    groups[gv].append(did)
                found_docs = len(ordered)
                page_groups = order_keys[: page * per_page][
                    (page - 1) * per_page :
                ]
                return {
                    "found": found_docs,
                    "found_docs": found_docs,
                    "found_groups": len(groups),
                    "page": page,
                    "grouped_hits": [
                        {
                            "group_key": [gv],
                            "found": len(groups[gv]),
                            "hits": [
                                {"document": doc_dict(d), "text_match": None}
                                for d in groups[gv][:limit]
                            ],
                        }
                        for gv in page_groups
                    ],
                    # facets ride alongside grouped_hits (Typesense),
                    # over the match set — the filtered corpus here
                    "facet_counts": self._facets(
                        params.get("facet_by"), filtered,
                        params.get("facet_query"), max_facet_values,
                    ),
                }
            ordered = self._sort_rows(filtered, params.get("sort_by"))
            found = len(ordered)
            rows = ordered[: page * per_page][(page - 1) * per_page :]
            return {
                "found": found,
                "page": page,
                "hits": [
                    {"document": doc_dict(d), "text_match": None} for d in rows
                ],
                "facet_counts": self._facets(
                    params.get("facet_by"), filtered,
                    params.get("facet_query"), max_facet_values,
                ),
            }

        # ------- ranked
        mf_weights = None
        if params.get("query_by"):
            fields = [
                f.strip() for f in params["query_by"].split(",") if f.strip()
            ]
            wstr = params.get("query_by_weights")
            if wstr:
                wvals = [float(x) for x in str(wstr).split(",")]
                mf_weights = dict(zip(fields, wvals))
            else:
                mf_weights = {f: 1.0 for f in fields}
        mf = mf_weights is not None
        terms = tokenize(q)
        num_typos = int(params.get("num_typos", 2))
        infix_mode = str(params.get("infix", "off")).lower()
        phrase_terms = None
        if '"' in q:
            m = re.fullmatch(r'\s*"([^"]+)"\s*', q)
            phrase_terms = tokenize(m.group(1))
            terms = phrase_terms
            num_typos = 0
            infix_mode = "off"
        if num_typos > 0:
            mapping = self._correct(terms, num_typos, mf)
            if infix_mode == "off":
                corrected = [
                    mapping[t] for t in terms if mapping.get(t) is not None
                ]
            else:
                corrected = [mapping.get(t) or t for t in terms]
            terms = corrected or terms

        slot_terms = None
        if terms and phrase_terms is None and (
            params.get("prefix") or infix_mode != "off"
        ):
            vocab = self._vocab_df(mf)
            *fixed, last = terms
            fixed = list(dict.fromkeys(fixed))

            def expand(t: str, is_last: bool) -> list[str]:
                exp = [t]
                if infix_mode == "always" or (
                    infix_mode == "fallback" and t not in vocab
                ):
                    exp = list(
                        dict.fromkeys(exp + self._expand("infix", t, mf))
                    )
                if is_last and params.get("prefix"):
                    pexp = self._expand("prefix", t, mf)
                    if infix_mode == "off":
                        exp = pexp or [t]
                    else:
                        exp = list(dict.fromkeys(exp + pexp))
                return exp

            slots = [expand(t, False) for t in fixed] + [expand(last, True)]
            if params.get("prefix") or any(len(s) > 1 for s in slots):
                slot_terms = slots
                terms = sorted({t for s in slots for t in s})

        mode = params.get("mode", "or")
        if phrase_terms is not None:
            mode = "and"
        allowed = filtered if clauses else None
        eff_slots = (
            slot_terms
            if slot_terms is not None
            else [[t] for t in dict.fromkeys(terms)]
        )
        drop_threshold = int(params.get("drop_tokens_threshold", 0))

        def drop_applies() -> bool:
            return bool(
                phrase_terms is None and slot_terms is None
                and drop_threshold and mode == "and"
            )

        # ------- ranked + sort_by override
        if params.get("sort_by"):
            if drop_applies():
                # the drop cascade applies under sort_by too (sort_by
                # changes the order, not the match semantics)
                terms, _, _ = self._drop_cascade(
                    terms, drop_threshold, allowed, mf_weights
                )
                eff_slots = [[t] for t in dict.fromkeys(terms)]
            ids = self._match_set(
                eff_slots, mode, allowed, mf_weights, phrase_terms
            )
            ordered = self._sort_rows(ids, params["sort_by"])
            rows = ordered[: page * per_page][(page - 1) * per_page :]
            return {
                "found": len(ids),
                "page": page,
                "hits": [
                    {"document": doc_dict(d), "text_match": None} for d in rows
                ],
                "facet_counts": self._facets(
                    params.get("facet_by"), ids,
                    params.get("facet_query"), max_facet_values,
                ),
            }

        # ------- grouped
        group_by = params.get("group_by")
        if group_by:
            limit = int(params.get("group_limit", 1))
            if drop_applies():
                # the drop cascade applies to grouped searches too —
                # groups then enumerate from the surviving-terms set
                terms, _, _ = self._drop_cascade(
                    terms, drop_threshold, allowed, mf_weights
                )
                eff_slots = [[t] for t in dict.fromkeys(terms)]
            scored, _ = self._ranked(
                eff_slots, mode, allowed, mf_weights, phrase_terms
            )
            groups: dict = {}
            for r in scored:
                gv = self.docs[r["doc_id"]].get(group_by)
                groups.setdefault(gv, []).append(r)
            firsts = sorted(
                groups.items(),
                key=lambda kv: (
                    -kv[1][0]["score"],
                    kv[0] is not None,
                    kv[0] if kv[0] is not None else "",
                ),
            )
            found_docs = sum(len(v) for v in groups.values())
            page_groups = [
                gv for gv, _ in firsts[: page * per_page][(page - 1) * per_page :]
            ]
            return {
                "found": found_docs,
                "found_docs": found_docs,
                "found_groups": len(groups),
                "page": page,
                "grouped_hits": [
                    {
                        "group_key": [gv],
                        "found": len(groups[gv]),
                        "hits": [
                            {
                                "document": doc_dict(r["doc_id"]),
                                "text_match": r["score"],
                            }
                            for r in groups[gv][:limit]
                        ],
                    }
                    for gv in page_groups
                ],
                # facets over the MATCH SET (all matched docs, not the
                # page of groups) — mirrors the engine's extra
                # match-ids pass
                "facet_counts": self._facets(
                    params.get("facet_by"),
                    [r["doc_id"] for r in scored],
                    params.get("facet_query"), max_facet_values,
                ),
            }

        # ------- ranked top-k (+ drop cascade + curation)
        n_curated = len(hidden | set(pinned.values()))
        k = page * per_page + n_curated
        if drop_applies():
            terms, rows_all, found = self._drop_cascade(
                terms, drop_threshold, allowed, mf_weights
            )
            eff_slots = [[t] for t in dict.fromkeys(terms)]
            all_rows = rows_all[:k]
        else:
            rows_all, found = self._ranked(
                eff_slots, mode, allowed, mf_weights, phrase_terms
            )
            all_rows = rows_all[:k]

        if pinned or hidden:
            curated_ids = sorted(hidden | set(pinned.values()))
            probe_allowed = {
                d for d in curated_ids
                if d in self.docs and (not clauses or d in filtered)
            }
            matchable = self._match_set(
                eff_slots, mode, probe_allowed, mf_weights, phrase_terms
            )
            curated_scores = {
                d: rnd(self._score(d, eff_slots, mf_weights))
                for d in matchable
            }
            existing = {d for d in curated_ids if d in self.docs}
            all_rows, found = self._curate(
                all_rows, found, pinned, hidden, curated_scores, existing,
                page * per_page,
            )
        rows = all_rows[(page - 1) * per_page :]
        hits = []
        for r in rows:
            hit = {"document": doc_dict(r["doc_id"]), "text_match": r["score"]}
            if r.get("curated"):
                hit["curated"] = True
            hits.append(hit)
        facet_counts = []
        if params.get("facet_by"):
            ids = self._match_set(
                eff_slots, mode, allowed, mf_weights, phrase_terms
            )
            facet_counts = self._facets(
                params.get("facet_by"), ids,
                params.get("facet_query"), max_facet_values,
            )
        return {
            "found": found,
            "page": page,
            "hits": hits,
            "facet_counts": facet_counts,
        }

    # --------------------------------------------------- curation
    @staticmethod
    def _parse_pinned(s) -> dict[int, int]:
        out = {}
        for part in str(s or "").split(","):
            part = part.strip()
            if part:
                did, pos = part.split(":")
                out[int(pos)] = int(did)
        return out

    @staticmethod
    def _parse_hidden(s) -> set[int]:
        return {
            int(p.strip()) for p in str(s or "").split(",") if p.strip()
        }

    @staticmethod
    def _curate(all_rows, found, pinned, hidden, curated_scores, existing,
                limit):
        rows = [{"doc_id": r["doc_id"], "score": r["score"]} for r in all_rows]
        pins, seen = {}, set()
        for pos in sorted(pinned):
            did = pinned[pos]
            if did in hidden or did not in existing or did in seen:
                continue
            pins[pos] = did
            seen.add(did)
        matched = set(curated_scores)
        found -= sum(1 for d in hidden if d in matched)
        found += sum(1 for d in pins.values() if d not in matched)
        score_of = {r["doc_id"]: r["score"] for r in rows}
        for did, sc in curated_scores.items():
            score_of.setdefault(did, sc)
        pin_ids = set(pins.values())
        organic = [
            r for r in rows
            if r["doc_id"] not in hidden and r["doc_id"] not in pin_ids
        ]
        out, oi, pos = [], 0, 1
        while len(out) < limit and (oi < len(organic) or pins):
            if pos in pins:
                did = pins.pop(pos)
                out.append(
                    {"doc_id": did, "score": score_of.get(did), "curated": True}
                )
            elif oi < len(organic):
                out.append(organic[oi])
                oi += 1
            else:
                did = pins.pop(min(pins))
                out.append(
                    {"doc_id": did, "score": score_of.get(did), "curated": True}
                )
            pos += 1
        return out, found
