"""Text-analysis operators for training-data curation.

Language ID (stopword-hit heuristic), quality scoring (length / punctuation /
stopword ratios), token counting (whitespace + BPE-ish sub-token regex), and
document fingerprinting. Every scorer is a pure JVM expression so it fuses
into the scan (one pass, full codegen); the oracle-SQL twins live in
__spark_entry__.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datacollector_spark.functions.hashing import md5_long, word_shingles

# tiny seeded stopword inventories per language — a deterministic n-gram/
# function-word heuristic, not a model (the container has no langid libs)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "was", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "une", "que", "pas", "pour", "dans"],
    "es": ["el", "la", "los", "que", "es", "una", "por", "con", "para", "del"],
}


def _tokens(col: Column) -> Column:
    return F.split(F.trim(F.lower(col)), r"\s+")


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.when(F.trim(col) == "", 0).otherwise(F.size(_tokens(col))).cast("int")


def subtoken_count(col: Column) -> Column:
    """BPE-ish sub-token count: runs of letters, runs of digits, or single
    punctuation — a deterministic proxy for tokenizer length used to budget
    sequence lengths at corpus scale."""
    arr = F.regexp_extract_all(col, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)
    return F.size(arr).cast("int")


def lang_hits(col: Column, lang: str) -> Column:
    """How many of the language's marker words occur as tokens."""
    toks = F.array_distinct(_tokens(col))
    markers = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
    return F.size(F.array_intersect(toks, markers)).cast("int")


def lang_id(col: Column) -> Column:
    """argmax over per-language marker hits; 'und' (undetermined) when no
    language scores >= 1. Ties break by language code order (deterministic)."""
    pairs = [(lang, lang_hits(col, lang)) for lang in sorted(LANG_MARKERS)]
    best_score = F.greatest(*[s for _, s in pairs])
    out = F.lit("und")
    # reversed so earlier language codes win ties
    for lang, score in reversed(pairs):
        out = F.when((score >= 1) & (score == best_score), F.lit(lang)).otherwise(out)
    return out


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword / uniqueness features + a composite
    quality score in [0,1]. One projection, no shuffle."""
    c = F.col(text_col)
    toks = _tokens(c)
    n_tok = token_count(c)
    n_chars = F.length(c)
    punct = F.length(F.regexp_replace(c, r"[^\.\,\;\:\!\?\'\"]", ""))
    stop = lang_hits(c, "en")
    uniq = F.size(F.array_distinct(toks))
    mean_word = (n_chars / F.greatest(n_tok, F.lit(1))).cast("double")
    punct_ratio = (punct / F.greatest(n_chars, F.lit(1))).cast("double")
    uniq_ratio = (uniq / F.greatest(n_tok, F.lit(1))).cast("double")
    score = (
        F.when(n_tok < 5, 0.0)
        .otherwise(
            F.least(
                F.lit(1.0),
                F.lit(0.25) * F.least(F.lit(1.0), n_tok.cast("double") / 50.0)
                + F.lit(0.25) * F.least(F.lit(1.0), stop.cast("double") / 4.0)
                + F.lit(0.25) * uniq_ratio
                + F.lit(0.25) * (F.lit(1.0) - F.least(F.lit(1.0), punct_ratio * 5.0)),
            )
        )
        .cast("double")
    )
    return df.withColumns(
        {
            "n_tokens": n_tok,
            "n_subtokens": subtoken_count(c),
            "mean_word_len": mean_word,
            "punct_ratio": punct_ratio,
            "uniq_token_ratio": uniq_ratio,
            "stopword_hits": stop,
            "quality_score": score,
        }
    )


def fingerprint(col: Column, shingle_n: int = 3) -> Column:
    """Document fingerprint: min md5-hash over word shingles (a 1-hash
    minhash) — stable under reordering-free edits, cross-engine
    reproducible. Rolling-hash analog with window = shingle_n words."""
    return F.array_min(
        F.transform(word_shingles(col, shingle_n), lambda s: md5_long(s))
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 512,
    overlap: int = 64,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Split documents into overlapping token-budget training chunks —
    the context-window preprocessing step: chunk i covers words
    [i*stride, i*stride + max_tokens) with stride = max_tokens - overlap,
    so consecutive chunks share ``overlap`` words and every word lands in
    at least one chunk. Output: one row per (doc, chunk) with
    ``chunk_idx``, ``chunk_text``, ``chunk_tokens`` (the last chunk may
    run short). Empty/short docs yield exactly one chunk.

    Pure JVM expression (split -> sequence -> transform/slice ->
    posexplode): fuses into the scan, the explode is map-side — zero
    shuffles, output rows ≈ corpus_tokens/stride.

    ``extra_cols`` ride through unchanged on every chunk row (each chunk
    inherits its parent document's values) — callers that need parent
    attributes on the chunks (e.g. the training-mix job's ``split``
    assignment) carry them here instead of re-joining the chunk frame back
    to the documents, which at corpus scale would shuffle every chunk's
    full text just to re-attach a small column."""
    if overlap >= max_tokens:
        raise ValueError("overlap must be < max_tokens")
    extras = [c for c in (extra_cols or []) if c != id_col]
    stride = max_tokens - overlap
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(words)
    k = F.greatest(
        F.ceil((n - F.lit(overlap)) / F.lit(float(stride))).cast("int"),
        F.lit(1),
    )
    chunks = F.transform(
        F.sequence(F.lit(0), k - 1),
        lambda i: F.slice(words, i * stride + 1, max_tokens),
    )
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in extras],
        F.posexplode(chunks).alias("chunk_idx", "_w"),
    ).select(
        id_col,
        *extras,
        "chunk_idx",
        F.concat_ws(" ", F.col("_w")).alias("chunk_text"),
        F.size("_w").alias("chunk_tokens"),
    )


def content_defined_chunks(col: Column, window: int = 16, mask_bits: int = 6) -> Column:
    """Rolling-hash content-defined chunk boundaries (character shingles):
    positions whose window-hash has ``mask_bits`` low zero bits. Returns
    array<int> boundary offsets — the building block for fuzzy diffing of
    near-identical long documents."""
    n = F.length(col)
    idx = F.sequence(F.lit(1), F.greatest(n - window, F.lit(1)))
    hashes = F.transform(idx, lambda i: md5_long(F.substring(col, i, window)))
    mask = (1 << mask_bits) - 1
    return F.filter(
        F.zip_with(
            hashes,
            idx,
            lambda h, i: F.when(h.bitwiseAND(F.lit(mask)) == 0, i).otherwise(F.lit(None)),
        ),
        lambda x: x.isNotNull(),
    )
