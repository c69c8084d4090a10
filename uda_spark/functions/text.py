"""Text-analysis primitives for the documents table — language ID,
quality scoring, token counting, fingerprinting (north-star text ops).

All fragments are engine-portable (see portable.py): integer/string-exact,
with doubles only as a final deterministic step, so the DuckDB oracle
matches bit-for-bit.  On the Spark side everything is higher-order
functions over the token array — zero shuffles, zero Python, fully inside
whole-stage codegen; at 100 TB these are pure map-side operators.
"""

from __future__ import annotations

from uda_spark.functions import portable

STOPWORDS = (
    "the", "a", "of", "and", "to", "in", "is", "on", "for", "with",
)

# Marker vocabularies for the n-gram-free language-ID heuristic: score each
# language by marker-token hits, predict the argmax (deterministic CASE
# chain, ties broken by fixed language order).
LANG_MARKERS = {
    "en": ("the", "and", "of", "fast", "small"),
    "es": ("agg", "data", "table", "row", "scan"),
    "de": ("key", "order", "sort", "merge", "join"),
    "fr": ("query", "group", "window", "filter", "batch"),
    "zh": ("spark", "hash", "vector", "stream", "column"),
}


def _arr(words: tuple[str, ...], engine: str) -> str:
    inner = ", ".join(f"'{w}'" for w in words)
    return f"array({inner})" if engine == "spark" else f"[{inner}]"


def token_count(toks: str, engine: str) -> str:
    return f"size({toks})" if engine == "spark" else f"len({toks})"


def stopword_hits(toks: str, engine: str, words: tuple[str, ...] = STOPWORDS) -> str:
    if engine == "spark":
        return f"size(filter({toks}, t -> array_contains({_arr(words, engine)}, t)))"
    return f"len(list_filter({toks}, t -> list_contains({_arr(words, engine)}, t)))"


def quality_score_ppm(toks: str, n_chars: str, engine: str) -> str:
    """Composite [0,1] quality score in integer parts-per-million.

    Engine-exact: integer terms with explicit DOUBLE casts only (no
    fractional literals — Spark parses those as DECIMAL), and the final
    value is floor(score * 1e6 + 1/2) as BIGINT — floor of an identical
    double is deterministic, unlike decimal-string rounding of a tie
    (round(x, 6) differed between engines on exact .5e-6 boundaries).
    """
    n_tok = token_count(toks, engine)
    stop = stopword_hits(toks, engine)
    one = "CAST(1 AS DOUBLE)"
    len_term = f"least({one}, CAST({n_chars} AS DOUBLE) / 500)"
    tok_term = f"least({one}, CAST({n_tok} AS DOUBLE) / 60)"
    stop_term = f"least({one}, CAST(5 * {stop} AS DOUBLE) / greatest({n_tok}, 1))"
    score = f"(4 * {len_term} + 3 * {tok_term} + 3 * {stop_term}) / 10"
    return f"CAST(floor(({score}) * 1000000 + {one} / 2) AS BIGINT)"


def lang_scores(toks: str, engine: str) -> dict[str, str]:
    return {
        lang: stopword_hits(toks, engine, words) for lang, words in LANG_MARKERS.items()
    }


def lang_predict(toks: str, engine: str) -> str:
    """Argmax over marker-hit scores as a portable CASE chain (first
    language in fixed order wins ties)."""
    scores = lang_scores(toks, engine)
    langs = list(scores)
    clauses = []
    for lang in langs:
        others = [f"{scores[lang]} >= {scores[o]}" for o in langs if o != lang]
        clauses.append(f"WHEN {' AND '.join(others)} THEN '{lang}'")
    return f"CASE {' '.join(clauses)} ELSE 'und' END"


FINGERPRINT_MOD = 1_000_000_000_000_000


def fingerprint(toks: str, engine: str) -> str:
    """Order-sensitive rolling hash over tokens (document fingerprint):
    fold acc = (acc * 31 + hash60(token)) mod 1e15."""
    if engine == "spark":
        h = portable.hash60("t", "spark")
        return (
            f"aggregate(transform({toks}, t -> {h}), 0L, "
            f"(acc, x) -> (acc * 31 + x) % {FINGERPRINT_MOD})"
        )
    h = portable.hash60("t", "duck")
    return (
        f"list_reduce(list_prepend(0::BIGINT, list_transform({toks}, t -> {h})), "
        f"(acc, x) -> (acc * 31 + x) % {FINGERPRINT_MOD})"
    )
