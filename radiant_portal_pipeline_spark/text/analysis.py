"""Text-analysis operators for the training-data pipeline: tokenization,
quality scoring, language-ID heuristic, fingerprinting.

All pure column expressions (JVM-side, whole-stage codegen) — no Python
in the hot path. Shared building blocks here; the registered queries
live in text/queries.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deliberately tiny — the operator is the shape (vectorized
# token-set scoring), not a production langid model.
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "is", "in", "a"],
    "fr": ["le", "la", "et", "les", "des", "un", "une"],
    "es": ["el", "los", "de", "y", "en", "que", "una"],
    "de": ["der", "die", "und", "das", "ist", "ein", "nicht"],
}

PUNCT_RE = r"[.,!?;:]"
# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def ws_tokens(col: Column) -> Column:
    """Whitespace tokens, empties removed (identical semantics to the
    DuckDB oracle's regexp_split_to_array + list_filter)."""
    return F.filter(F.split(F.lower(col), r"\s+"), lambda t: t != "")


def token_count(col: Column) -> Column:
    return F.size(ws_tokens(col))


def bpe_token_count(col: Column) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(BPE_RE), F.lit(0)))


def punct_count(col: Column) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(PUNCT_RE), F.lit(0)))


def stopword_hits(col: Column, lang: str) -> Column:
    words = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    return F.size(F.filter(ws_tokens(col), lambda t: F.array_contains(words, t)))


def normalized_fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of lowercased, whitespace-collapsed,
    trimmed text (the locus_hash idea — reference
    radiant/tasks/vcf/snv/common.py:38-56 — applied to documents)."""
    return F.md5(F.trim(F.regexp_replace(F.lower(col), r"\s+", " ")))


def quality_features(col: Column) -> dict[str, Column]:
    n_chars = F.length(col)
    n_tok = token_count(col)
    return {
        "n_chars": n_chars,
        "n_tokens": n_tok,
        "punct_ratio": F.round(punct_count(col) / F.greatest(n_chars, F.lit(1)), 4),
        "stopword_ratio": F.round(
            stopword_hits(col, "en") / F.greatest(n_tok, F.lit(1)), 4
        ),
        "mean_token_len": F.round(
            (F.length(F.concat_ws("", ws_tokens(col)))) / F.greatest(n_tok, F.lit(1)), 4
        ),
    }


def langid_pred(col: Column) -> Column:
    """Pick the language whose stopword list hits most; zero hits →
    'und'; ties broken by fixed lang order (en, fr, es, de) — the same
    CASE chain the oracle uses, so results are engine-identical."""
    hits = {lang: stopword_hits(col, lang) for lang in LANG_STOPWORDS}
    best = F.greatest(*hits.values())
    expr = F.lit("und")
    for lang in reversed(list(LANG_STOPWORDS)):
        expr = F.when((hits[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr
