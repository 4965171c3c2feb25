"""Text analysis for large-scale training-data pipelines.

All hot-path expressions are Catalyst built-ins (JVM, whole-stage
codegen) — tokenization, shingling, ratios, fingerprints scale linearly
with no Python in the loop. The tokenizer is defined to be bit-identical
to a DuckDB SQL equivalent so every operator here is oracle-checkable
(see queries.py).

At 100 TB: these are embarrassingly parallel map-only transforms — no
shuffle at all; Catalyst prunes the scan to (id, text).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deterministic, dependency-free.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "with"],
    "fr": ["le", "la", "les", "de", "des", "et", "un", "une", "est", "que"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "nicht", "mit", "zu"],
    "es": ["el", "la", "los", "de", "y", "un", "una", "es", "que", "en"],
}


def tokens_col(text: Column | str) -> Column:
    """Lowercase alnum tokenizer; identical to the DuckDB expression
    list_filter(string_split_regex(regexp_replace(lower(t),
    '[^a-z0-9]+', ' ', 'g'), ' '), x -> x <> '')."""
    c = F.col(text) if isinstance(text, str) else text
    raw = F.split(F.regexp_replace(F.lower(c), "[^a-z0-9]+", " "), " ")
    return F.filter(raw, lambda x: x != F.lit(""))


def shingles_col(toks: Column, k: int = 3, distinct: bool = True) -> Column:
    """k-token shingles ('a b c'); empty array when fewer than k tokens."""
    n = F.size(toks)
    seq = F.when(n >= k, F.sequence(F.lit(1), n - k + 1)).otherwise(
        F.array().cast("array<int>")
    )
    sh = F.transform(seq, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))
    return F.array_distinct(sh) if distinct else sh


def token_count(text: Column | str) -> Column:
    return F.size(tokens_col(text))


def bpe_ish_token_count(text: Column | str) -> Column:
    """Sub-word-ish token count: words + digits + punctuation marks each
    count (a cheap proxy for BPE token counts at data-audit time)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(
        F.filter(
            F.split(F.regexp_replace(
                c, r"([0-9]|[^A-Za-z0-9\s])", r" $1 "), r"\s+"),
            lambda x: x != F.lit(""),
        )
    )


def text_stats(df: DataFrame, text_col: str = "text",
               keep: list[str] | None = None) -> DataFrame:
    """Per-document quality/shape features (all built-in expressions)."""
    c = F.col(text_col)
    toks = tokens_col(c)
    n_char = F.length(c)
    n_tok = F.size(toks)
    n_alnum = F.length(F.regexp_replace(c, "[^A-Za-z0-9]", ""))
    n_digit = F.length(F.regexp_replace(c, "[^0-9]", ""))
    n_upper = F.length(F.regexp_replace(c, "[^A-Z]", ""))
    n_punct = F.length(F.regexp_replace(c, r"[^.,;:!?'\"()-]", ""))
    n_space = F.length(F.regexp_replace(c, r"[^ \t\n]", ""))
    en_hits = F.size(F.array_intersect(
        toks, F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])))
    safe_tok = F.greatest(n_tok, F.lit(1))
    avg_tok_len = (n_alnum.cast("double") / safe_tok)
    stop_ratio = en_hits.cast("double") / safe_tok
    quality = (
        F.when(n_char < 20, 0.0).otherwise(1.0)
        * (1.0 - F.least(n_digit.cast("double") / F.greatest(n_char, F.lit(1)),
                         F.lit(1.0)))
        * F.least(stop_ratio * 4.0 + 0.2, F.lit(1.0))
    )
    out = df.select(
        *(keep or df.columns),
        n_char.alias("n_char"),
        n_tok.alias("n_tok"),
        n_digit.alias("n_digit"),
        n_upper.alias("n_upper"),
        n_punct.alias("n_punct"),
        n_space.alias("n_space"),
        F.round(avg_tok_len, 6).alias("avg_tok_len"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(quality, 6).alias("quality"),
    )
    return out


def lang_id(df: DataFrame, text_col: str = "text",
            keep: list[str] | None = None) -> DataFrame:
    """Stopword-hit language ID over LANG_STOPWORDS; ties → lexicographic
    smallest language; no hits → 'und'."""
    toks = tokens_col(F.col(text_col))
    hit_cols = {
        lang: F.size(F.array_intersect(
            toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in sorted(LANG_STOPWORDS.items())
    }
    # argmax with deterministic tie-break: fold over sorted languages
    best_lang = F.lit("und")
    best_hits = F.lit(0)
    for lang, hits in sorted(hit_cols.items()):
        better = hits > best_hits
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(better, hits).otherwise(best_hits)
    return df.select(
        *(keep or df.columns),
        *[hits.alias(f"hits_{lang}") for lang, hits in sorted(hit_cols.items())],
        best_lang.alias("lang_pred"),
    )


def fingerprint(df: DataFrame, text_col: str = "text",
                keep: list[str] | None = None) -> DataFrame:
    """Document fingerprints: md5 of normalized text (exact-dup key) and
    min/max shingle hash (winnowing-style rolling-window content key)."""
    toks = tokens_col(F.col(text_col))
    norm = F.concat_ws(" ", toks)
    sh = shingles_col(toks, 3)
    hashes = F.transform(sh, lambda x: F.md5(x))
    return df.select(
        *(keep or df.columns),
        F.md5(norm).alias("fp_exact"),
        F.array_min(hashes).alias("fp_min_shingle"),
        F.array_max(hashes).alias("fp_max_shingle"),
    )
