"""Match-span refinement — the engine's analog of the reference's
query-side fuzzy re-location pipeline:

* exact-substring short-circuit, score 1.0   (/root/reference/src/fuzzy.rs:24-26)
* anchor-prefix candidate search              (fuzzy.rs:31-43)
* sparse fallback scan                        (fuzzy.rs:46-51)
* Jaro-Winkler windowed scoring, early exit   (fuzzy.rs:62-93, jaro fuzzy.rs:104-166)
* greedy non-overlap dedup                    (fuzzy.rs:168-181)
* sentence-boundary snapping                  (/root/reference/src/bin/app/pdf.rs:79-121)

Fresh Python implementation of the published Jaro/Jaro-Winkler
definitions — not a port of the Rust (different data layout: numpy
char arrays inside an Arrow-batched pandas UDF over the ≤k winners).
Char bounding boxes (pdf.rs:33-77) have no transcript analog; the
output is (start, end, score) character offsets into the turn text.

This runs AFTER top-k, on k rows — per-row Python cost is bounded by
k, never corpus size (same asymmetry the reference exploits:
highlights computed only for the 5 returned hits, search.rs:115-184).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from semantic_pdf_search_engine_spark.config import FUZZY_EARLY_EXIT, FUZZY_THRESHOLD
from semantic_pdf_search_engine_spark.functions.normalize import normalize_py

_SENT_ENDERS = ".!?"


def jaro(a: str, b: str) -> float:
    """Classic Jaro similarity (match window max(|a|,|b|)/2 − 1)."""
    if a == b:
        return 1.0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    a_match = [False] * la
    b_match = [False] * lb
    matches = 0
    for i in range(la):
        lo = max(0, i - window)
        hi = min(lb, i + window + 1)
        for j in range(lo, hi):
            if not b_match[j] and a[i] == b[j]:
                a_match[i] = True
                b_match[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    # transpositions: count mismatched order among matched chars
    bi = 0
    transpositions = 0
    for i in range(la):
        if a_match[i]:
            while not b_match[bi]:
                bi += 1
            if a[i] != b[bi]:
                transpositions += 1
            bi += 1
    t = transpositions / 2
    m = matches
    return (m / la + m / lb + (m - t) / m) / 3.0


def jaro_winkler(a: str, b: str, prefix_scale: float = 0.1) -> float:
    j = jaro(a, b)
    prefix = 0
    for x, y in zip(a[:4], b[:4]):
        if x != y:
            break
        prefix += 1
    return j + prefix * prefix_scale * (1.0 - j)


def fuzzy_find(
    haystack: str,
    needle: str,
    threshold: float = FUZZY_THRESHOLD,
) -> list[tuple[int, int, float]]:
    """Locate fuzzy occurrences of `needle` in `haystack`; returns
    non-overlapping (start, end, score) sorted by start.

    Candidate generation mirrors the reference's strategy shape:
    exact-match short-circuit, then anchor-prefix scan (prefix length
    clamp(|needle|/6, 2, 8), candidate start = hit − 3), then a sparse
    fallback every max(|needle|/4, 1) chars; windows sized
    [|needle|, 1.3·|needle|] scored by Jaro-Winkler with early exit.
    """
    h, n = haystack.lower(), needle.lower()
    if not n or not h:
        return []
    # exact-substring short-circuit
    out = []
    start = h.find(n)
    if start >= 0:
        while start >= 0:
            out.append((start, start + len(n), 1.0))
            start = h.find(n, start + len(n))
        return out

    anchor_len = min(8, max(2, len(n) // 6))
    anchor = n[:anchor_len]
    candidates = []
    pos = h.find(anchor)
    while pos >= 0:
        candidates.append(max(0, pos - 3))
        pos = h.find(anchor, pos + 1)
    if not candidates:
        step = max(len(n) // 4, 1)
        candidates = list(range(0, max(1, len(h) - len(n) + 1), step))

    max_w = int(np.ceil(1.3 * len(n)))
    results: list[tuple[int, int, float]] = []
    last_end = -1
    for c in sorted(set(candidates)):
        if c < last_end:
            continue
        best = None
        for w in range(len(n), max_w + 1):
            if c + w > len(h):
                break
            score = jaro_winkler(h[c : c + w], n)
            if score >= threshold and (best is None or score > best[2]):
                best = (c, c + w, score)
            if score > FUZZY_EARLY_EXIT:
                break
        if best:
            results.append(best)
            last_end = best[1]
    return dedup_spans(results)


def dedup_spans(spans: list[tuple[int, int, float]]) -> list[tuple[int, int, float]]:
    """Greedy keep-best non-overlapping intervals, returned by start."""
    kept: list[tuple[int, int, float]] = []
    for s in sorted(spans, key=lambda x: -x[2]):
        if all(s[1] <= k[0] or s[0] >= k[1] for k in kept):
            kept.append(s)
    return sorted(kept, key=lambda x: x[0])


def snap_to_sentence(text: str, start: int, end: int) -> tuple[int, int]:
    """Widen (start, end) to sentence boundaries: left to the char after
    the previous sentence ender (skipping whitespace), right through the
    next ender (absorbing closing quotes/parens)."""
    i = start
    while i > 0 and text[i - 1] not in _SENT_ENDERS:
        i -= 1
    while i < start and text[i] in " \t\n":
        i += 1
    j = end
    while j < len(text):
        if text[j] in _SENT_ENDERS:
            j += 1
            break
        j += 1
    while j < len(text) and text[j] in "\"')]":
        j += 1
    return i, j


def refine_spans(
    hits: DataFrame,
    query: str,
    text_col: str = "text",
    threshold: float = FUZZY_THRESHOLD,
    snap: bool = True,
) -> DataFrame:
    """Add `matches ARRAY<STRUCT<start:int, end:int, score:double>>`
    locating the (normalized) query inside each hit's text."""
    needle = normalize_py(query)
    # per-term fallback for multi-term queries: a BM25 hit rarely
    # contains the whole query as a phrase — highlight each term
    term_needles = [t for t in needle.lower().split() if t]
    out_schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in hits.schema.fields)
        + ", matches array<struct<start:int, end:int, score:double>>"
    )

    def refine(batches):
        for pdf in batches:
            ms = []
            for text in pdf[text_col].tolist():
                hay = normalize_py(text or "")
                spans = fuzzy_find(hay, needle, threshold)
                if not spans and len(term_needles) > 1:
                    per_term: list[tuple[int, int, float]] = []
                    for t in term_needles:
                        per_term.extend(fuzzy_find(hay, t, threshold))
                    spans = dedup_spans(per_term)
                if snap:
                    spans = dedup_spans(
                        [(*snap_to_sentence(hay, s, e), sc) for s, e, sc in spans]
                    )
                ms.append([{"start": s, "end": e, "score": float(sc)} for s, e, sc in spans])
            out = pdf.copy()
            out["matches"] = pd.Series(ms, index=pdf.index, dtype=object)
            yield out

    return hits.mapInPandas(refine, schema=out_schema)


def snippet_exprs(text_col, terms: list[str], radius: int = 60, width: int = 160):
    """(first_off, snippet) Column pair: a fixed-width snippet around
    the EARLIEST occurrence of any query term in lower(text) — the
    exact-match half of the reference's highlight stage
    (/root/reference/src/fuzzy.rs:24-26 exact short-circuit), SQL-
    expressible so it gets a hard oracle (unlike the Jaro-Winkler
    fallback above, which stays rows-only).

    first_off is 1-based (SQL strpos convention), NULL when no term
    occurs. Pure JVM expressions (instr/least/substring) evaluated on
    the <=k winner rows only — runs post-top-k, cost bounded by k.
    Both engines' least()/greatest() skip NULLs, instr/strpos agree on
    1-based-or-0 semantics, and substring clamps — pinned by the
    term_snippets oracle and tests/test_suggest.py known values.
    """
    from pyspark.sql import functions as F

    lt = F.lower(text_col)
    offs = [F.nullif(F.instr(lt, F.lit(t)), F.lit(0)) for t in terms]
    first_off = F.least(*offs) if len(offs) > 1 else offs[0]
    start = F.greatest(F.lit(1), first_off - F.lit(radius))
    return first_off, F.substring(lt, start, width)
