"""Text-analysis operators for corpus curation: token counting, quality
scoring, language ID, and document fingerprinting.

All pure Column algebra over ``split``/``filter``/``aggregate`` — each
document is scored independently, so these map-parallelize perfectly and
never shuffle (the scan partitioning is the output partitioning).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny per-language stopword marker lists for the n-gram/stopword
#: language-ID heuristic. Ordered: first match priority on ties.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "nicht", "ist"),
    "fr": ("le", "la", "les", "et", "est", "une"),
    "es": ("el", "los", "las", "es", "una", "y"),
    "zh": ("de5", "shi4", "le5", "zai4"),  # pinyin-ish markers
}

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")


def tokens(col: Column) -> Column:
    return F.split(F.lower(col), r"\s+")


def token_count(col: Column) -> Column:
    """Whitespace token count (BPE-ish subword estimate ≈ chars/4 is the
    companion heuristic — see ``token_estimate``)."""
    return F.size(tokens(col))


def token_estimate(col: Column) -> Column:
    """BPE-ish token-count estimate: ceil(chars / 4) — the standard
    rule-of-thumb for byte-pair-encoded subwords."""
    return F.ceil(F.length(col) / 4).cast("bigint")


def _count_in(toks: Column, words: tuple[str, ...]) -> Column:
    wordset = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(wordset, t)))


def stopword_ratio(col: Column, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    toks = tokens(col)
    return F.round(_count_in(toks, stopwords) / F.greatest(F.size(toks), F.lit(1)), 6)


def avg_word_len(col: Column) -> Column:
    toks = tokens(col)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.round(total / F.greatest(F.size(toks), F.lit(1)), 6)


def quality_score(col: Column) -> Column:
    """Composite quality heuristic in [0,1]: penalize extreme length,
    missing stopwords, and very short/long average word length — the
    classic cheap pre-filters for LLM training corpora."""
    n = token_count(col)
    len_ok = F.when((n >= 5) & (n <= 10000), F.lit(0.4)).otherwise(F.lit(0.0))
    stop_ok = F.when(stopword_ratio(col) >= 0.05, F.lit(0.3)).otherwise(F.lit(0.0))
    awl = avg_word_len(col)
    awl_ok = F.when((awl >= 2.5) & (awl <= 10), F.lit(0.3)).otherwise(F.lit(0.0))
    return F.round(len_ok + stop_ok + awl_ok, 2)


def lang_id(col: Column) -> Column:
    """Stopword-marker language ID: argmax of per-language marker hits,
    first-listed language wins ties, 'und' when nothing matches."""
    toks = tokens(col)
    scores = [(lang, _count_in(toks, words)) for lang, words in LANG_MARKERS.items()]
    best = F.greatest(*[s for _, s in scores])
    expr = F.lit("und")
    # build reversed so earlier languages take priority on ties
    for lang, s in reversed(scores):
        expr = F.when((s == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def chunk_documents(
    df,
    id_col: str,
    text_col: str,
    max_tokens: int = 32,
    overlap: int = 8,
):
    """Split documents into overlapping token-bounded chunks — the
    training-data windowing op (context-length packing). Pure array
    algebra: token array -> start-index sequence -> explode -> slice.
    One output row per chunk; no shuffle (map-side explode only).
    """
    if overlap >= max_tokens:
        raise ValueError("overlap must be < max_tokens")
    step = max_tokens - overlap
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    starts = F.sequence(F.lit(1), F.greatest(n - overlap, F.lit(1)), F.lit(step))
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            toks.alias("__toks"),
            F.posexplode(starts).alias("chunk_idx", "start"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.concat_ws(" ", F.slice(F.col("__toks"), F.col("start"), max_tokens)).alias(
                "chunk_text"
            ),
            F.least(
                F.size(F.col("__toks")) - F.col("start") + 1, F.lit(max_tokens)
            ).cast("int").alias("n_chunk_tokens"),
        )
    )


def tfidf_features(df, id_col: str, text_col: str, n_features: int = 1 << 12):
    """TF-IDF feature vectors via pyspark.ml (HashingTF + IDF) — the
    SURVEY §7.2 text-analysis scale path: hashing keeps the vocabulary
    unbounded-safe (no global dictionary to build), IDF is one small
    aggregate broadcast back. Returns (id, features ml-vector)."""
    from pyspark.ml.feature import IDF, HashingTF, Tokenizer

    tok = Tokenizer(inputCol=text_col, outputCol="__words")
    tf = HashingTF(inputCol="__words", outputCol="__tf", numFeatures=n_features)
    words = tok.transform(df.select(F.col(id_col).alias("id"), F.col(text_col)))
    tfed = tf.transform(words)
    idf = IDF(inputCol="__tf", outputCol="features").fit(tfed)
    return idf.transform(tfed).select("id", "features")


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 over normalized text
    (lowercased, whitespace-collapsed) — the rolling-hash analog used for
    cross-run change detection (ST3/ST4)."""
    return F.md5(F.concat_ws(" ", tokens(col)))
