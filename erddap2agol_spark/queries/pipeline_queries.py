"""Round-3 training-data-pipeline queries over ``documents``.

Corpus hygiene beyond dedup: rule-battery quality gates (Gopher-style),
token-rarity scoring (the integer-exact stand-in for unigram-LM
perplexity), character-distribution stats, per-domain frequency caps,
and deterministic JSONL export rendering. Every float emitted here is
either a ratio of exact integer aggregates or an explicitly rounded
value, so the DuckDB oracle hashes bit-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import text as T
from ..sources.tables import load_table
from . import register

_STOP_SQL = ", ".join(f"'{w}'" for w in T.STOPWORDS)


def _gopher_metrics(text: F.Column):
    """The five Gopher metric columns over a text column (map-only)."""
    t = T.tokens(text)
    n_words = F.size(t)
    denom_w = F.greatest(n_words, F.lit(1))
    mwl = F.round(
        F.aggregate(t, F.lit(0), lambda a, w: a + F.length(w)) / denom_w, 6
    )
    alpha = F.round(
        F.size(F.filter(t, lambda w: w.rlike("[a-z]"))).cast("double")
        / denom_w,
        6,
    )
    sym = F.round(
        F.size(F.regexp_extract_all(text, F.lit(r"[^a-z0-9\s]"), 0))
        .cast("double")
        / F.greatest(F.length(text), F.lit(1)),
        6,
    )
    wordset = F.array(*[F.lit(w) for w in T.STOPWORDS])
    stop_hits = F.size(F.filter(t, lambda w: F.array_contains(wordset, w)))
    return n_words, mwl, alpha, sym, stop_hits


def gopher_keep_bit(text: F.Column) -> F.Column:
    """The combined Gopher keep decision as ONE map-side 0/1 column —
    the shareable form for pipelines (corpus_manifest) that need the
    gate INLINE on their own scan instead of a |docs|-row join back to
    the gopher_quality_flags query result (review r8: the manifest's
    q-join was two exchanges + a sort for a bit the scan could compute
    in place).  Same expressions and thresholds as the graded
    gopher_quality_flags query — both derive from
    :func:`_gopher_metrics`, so the two surfaces cannot drift."""
    n_words, mwl, alpha, sym, stop_hits = _gopher_metrics(text)
    keep = (
        (n_words >= 10)
        & (n_words <= 100000)
        & (mwl >= 2.0)
        & (mwl <= 12.0)
        & (alpha >= 0.8)
        & (sym <= 0.1)
        & (stop_hits >= 1)
    )
    return F.when(keep, F.lit(1)).otherwise(F.lit(0))


@register(
    "gopher_quality_flags",
    oracle=f"""
    WITH m AS (
      SELECT doc_id,
             regexp_split_to_array(lower(text), '\\s+') AS t,
             length(text) AS n_chars,
             len(regexp_extract_all(text, '[^a-z0-9\\s]')) AS n_sym
      FROM documents
    ),
    s AS (
      SELECT doc_id,
             len(t) AS n_words,
             round(list_sum(list_transform(t, w -> length(w)))
                   / greatest(len(t), 1), 6) AS mean_word_len,
             round(CAST(len(list_filter(t, w -> regexp_matches(w, '[a-z]')))
                   AS DOUBLE) / greatest(len(t), 1), 6) AS alpha_word_ratio,
             round(CAST(n_sym AS DOUBLE) / greatest(n_chars, 1), 6)
               AS symbol_ratio,
             len(list_filter(t, w -> list_contains([{_STOP_SQL}], w)))
               AS stop_hits
      FROM m
    )
    SELECT doc_id, n_words, mean_word_len, alpha_word_ratio, symbol_ratio,
           stop_hits,
           CASE WHEN n_words BETWEEN 10 AND 100000 THEN 1 ELSE 0 END AS flag_len,
           CASE WHEN mean_word_len BETWEEN 2.0 AND 12.0 THEN 1 ELSE 0 END AS flag_mwl,
           CASE WHEN alpha_word_ratio >= 0.8 THEN 1 ELSE 0 END AS flag_alpha,
           CASE WHEN symbol_ratio <= 0.1 THEN 1 ELSE 0 END AS flag_sym,
           CASE WHEN stop_hits >= 1 THEN 1 ELSE 0 END AS flag_stop,
           CASE WHEN n_words BETWEEN 10 AND 100000
                 AND mean_word_len BETWEEN 2.0 AND 12.0
                 AND alpha_word_ratio >= 0.8
                 AND symbol_ratio <= 0.1
                 AND stop_hits >= 1 THEN 1 ELSE 0 END AS keep
    FROM s
    """,
    doc="Gopher-style rule battery: word count, mean word length, "
    "alphabetic-word ratio, symbol ratio, stopword presence — each as an "
    "explicit 0/1 flag plus the combined keep decision. A single narrow "
    "projection (no shuffle at any scale); the reference's quality gates "
    "generalized to the published Gopher/C4 filter set.",
)
def gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_words, mwl, alpha, sym, stop_hits = _gopher_metrics(F.col("text"))

    out = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        mwl.alias("mean_word_len"),
        alpha.alias("alpha_word_ratio"),
        sym.alias("symbol_ratio"),
        stop_hits.alias("stop_hits"),
    )
    f_len = (F.col("n_words") >= 10) & (F.col("n_words") <= 100000)
    f_mwl = (F.col("mean_word_len") >= 2.0) & (F.col("mean_word_len") <= 12.0)
    f_alpha = F.col("alpha_word_ratio") >= 0.8
    f_sym = F.col("symbol_ratio") <= 0.1
    f_stop = F.col("stop_hits") >= 1

    def _bit(c) -> F.Column:
        return F.when(c, F.lit(1)).otherwise(F.lit(0))

    return out.select(
        "*",
        _bit(f_len).alias("flag_len"),
        _bit(f_mwl).alias("flag_mwl"),
        _bit(f_alpha).alias("flag_alpha"),
        _bit(f_sym).alias("flag_sym"),
        _bit(f_stop).alias("flag_stop"),
        _bit(f_len & f_mwl & f_alpha & f_sym & f_stop).alias("keep"),
    )


@register(
    "token_rarity",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok
      FROM documents
    ),
    cnt AS (SELECT tok, count(*) AS c FROM tok GROUP BY tok),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM cnt)
    SELECT t.doc_id,
           count(*) AS n_tok,
           CAST(sum(c.c) AS BIGINT) AS sum_tok_cnt,
           CAST(min(c.c) AS BIGINT) AS min_tok_cnt,
           round(CAST(sum(c.c) AS DOUBLE) / count(*) / any_value(tot.total), 9)
             AS mean_tok_freq
    FROM tok t JOIN cnt c USING (tok) CROSS JOIN tot
    GROUP BY t.doc_id
    """,
    doc="Unigram-LM rarity scoring — the integer-exact stand-in for "
    "perplexity filtering: per document, the mean corpus frequency of its "
    "tokens and the rarest token's count (rare-token-heavy docs score "
    "low / min small). All aggregates are integer sums, so no float-"
    "summation-order hazard exists cross-engine; the single division is "
    "IEEE-exact. Scale shape: the vocabulary count is one map-side-"
    "combinable hash aggregate; the score join keys on the token and the "
    "count table is tiny relative to the corpus (AQE broadcasts it), so "
    "documents shuffle once on (doc) for the final per-doc aggregate. "
    "Hot tokens (stopwords) are absorbed by the partial aggregates, "
    "never a pair fan-out.",
)
def token_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(T.tokens(F.col("text"))).alias("tok")
    )
    cnt = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.agg(F.sum("c").cast("bigint").alias("total"))
    per_doc = (
        tok.join(cnt, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.sum("c").cast("bigint").alias("sum_tok_cnt"),
            F.min("c").cast("bigint").alias("min_tok_cnt"),
        )
    )
    return per_doc.crossJoin(F.broadcast(tot)).select(
        "doc_id",
        "n_tok",
        "sum_tok_cnt",
        "min_tok_cnt",
        F.round(
            F.col("sum_tok_cnt").cast("double") / F.col("n_tok") / F.col("total"),
            9,
        ).alias("mean_tok_freq"),
    )


@register(
    "char_stats",
    oracle="""
    WITH ch AS (
      SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents
    ),
    per AS (
      SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY doc_id, ch
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_chars,
           count(*) AS n_distinct_chars,
           round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS top_char_ratio
    FROM per GROUP BY doc_id
    """,
    doc="Character-distribution stats per document: total chars, distinct "
    "chars, and the modal character's share — the cheap entropy proxy "
    "that catches binary junk and repeated-character spam. Two stacked "
    "hash aggregates on (doc, char) then (doc); both partial-aggregate "
    "friendly, no joins, no windows.",
)
def char_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    per = (
        docs.select("doc_id", F.explode(F.split(F.col("text"), "")).alias("ch"))
        .filter(F.col("ch") != "")  # Spark split('') emits a trailing ''
        .groupBy("doc_id", "ch")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return per.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_chars"),
        F.count(F.lit(1)).alias("n_distinct_chars"),
        F.round(F.max("c").cast("double") / F.sum("c"), 6).alias(
            "top_char_ratio"
        ),
    )


_DOMAIN_CAP = 15


@register(
    "domain_cap_sample",
    oracle=f"""
    SELECT doc_id, source, rk FROM (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
               AS rk
      FROM documents
    ) WHERE rk <= {_DOMAIN_CAP}
    """,
    doc="Per-domain frequency cap (the Gopher/RefinedWeb 'no single site "
    "dominates' rule): keep at most N documents per source, chosen by a "
    "deterministic hash order so the sample is stable across runs and "
    "engines. One window shuffle on the domain key; at web scale the "
    "heavy-hitter domains are exactly the ones being capped, so the "
    "post-filter output is bounded at N rows per key regardless of skew "
    "(pair the window with a pre-aggregated count filter to short-"
    "circuit sorting mega-domains when N << domain size).",
)
def domain_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select("doc_id", "source", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= _DOMAIN_CAP)
    )


@register(
    "jsonl_render",
    oracle="""
    SELECT doc_id,
           '{"id":' || CAST(doc_id AS VARCHAR)
           || ',"lang":"' || lang
           || '","text":"'
           || replace(replace(text, '\\', '\\\\'), '"', '\\"')
           || '"}' AS jsonl
    FROM documents
    """,
    doc="Deterministic JSONL export rendering — the byte-exact record "
    "format a tokenizer shard consumes. Explicit concatenation (not an "
    "engine to_json) pins key order and escaping so every engine emits "
    "identical bytes; a narrow projection that parallelizes as a pure "
    "map over any partitioning.",
)
def jsonl_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # Java replacement-string escaping: `\\\\` emits two backslashes,
    # `\\"` emits backslash-quote
    esc = F.regexp_replace(
        F.regexp_replace(F.col("text"), F.lit(r"\\"), F.lit(r"\\\\")),
        F.lit('"'),
        F.lit(r"\\" + '"'),
    )
    return docs.select(
        "doc_id",
        F.concat(
            F.lit('{"id":'),
            F.col("doc_id").cast("string"),
            F.lit(',"lang":"'),
            F.col("lang"),
            F.lit('","text":"'),
            esc,
            F.lit('"}'),
        ).alias("jsonl"),
    )


@register(
    "length_percentile_filter",
    oracle="""
    WITH b AS (
      SELECT lang,
             round(quantile_cont(n_chars, 0.05), 6) AS lo,
             round(quantile_cont(n_chars, 0.95), 6) AS hi
      FROM documents GROUP BY lang
    )
    SELECT doc_id, d.lang, n_chars, lo, hi
    FROM documents d JOIN b ON d.lang = b.lang
    WHERE n_chars >= lo AND n_chars <= hi
    """,
    doc="Per-language length-outlier clip: keep documents inside the "
    "[p5, p95] band of their language's length distribution. The exact "
    "interpolated percentile is one grouped aggregate (|langs| rows) "
    "that broadcasts back onto the corpus — a narrow map, no window, no "
    "sort of the corpus. Bounds are rounded to 6dp before the compare "
    "so an integer length can never straddle a cross-engine ulp.",
)
def length_percentile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bounds = docs.groupBy("lang").agg(
        F.round(F.percentile("n_chars", F.lit(0.05)), 6).alias("lo"),
        F.round(F.percentile("n_chars", F.lit(0.95)), 6).alias("hi"),
    )
    return (
        docs.join(F.broadcast(bounds), "lang")
        .where((F.col("n_chars") >= F.col("lo")) & (F.col("n_chars") <= F.col("hi")))
        .select("doc_id", "lang", "n_chars", "lo", "hi")
    )


@register(
    "doc_length_log_histogram",
    oracle="""
    SELECT lang,
           CAST(floor(ln(n_chars) / ln(2)) AS BIGINT) AS log2_bucket,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    WHERE n_chars > 0
    GROUP BY 1, 2
    """,
    doc="Per-language log2-bucketed length histogram — the corpus-report "
    "staple (token-budget planning, truncation-policy sizing). "
    "floor(log2(len)) is a narrow map; one hash aggregate with map-side "
    "combine; bucket count is ~40 regardless of corpus size.",
)
def doc_length_log_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.where(F.col("n_chars") > 0)
        .groupBy(
            "lang",
            F.floor(F.log2("n_chars")).cast("bigint").alias("log2_bucket"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


@register(
    "table_profile",
    oracle="""
    SELECT count(*) AS n_rows,
           count(text) AS text_nonnull,
           count(DISTINCT lang) AS lang_distinct,
           count(DISTINCT source) AS source_distinct,
           CAST(min(n_chars) AS BIGINT) AS len_min,
           CAST(max(n_chars) AS BIGINT) AS len_max,
           round(avg(n_chars), 6) AS len_avg,
           round(stddev_samp(n_chars), 6) AS len_std
    FROM documents
    """,
    doc="One-pass table profiler (the engine-side df.summary()): row "
    "count, per-column null and distinct counts, numeric min/max/avg/"
    "stddev — all in a SINGLE aggregate so profiling 100 TB costs one "
    "scan, not one scan per statistic. Distinct counts are exact here "
    "(low-cardinality columns); swap approx_count_distinct for "
    "high-cardinality ids at scale.",
)
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("text").alias("text_nonnull"),
        F.countDistinct("lang").alias("lang_distinct"),
        F.countDistinct("source").alias("source_distinct"),
        F.min("n_chars").cast("bigint").alias("len_min"),
        F.max("n_chars").cast("bigint").alias("len_max"),
        F.round(F.avg("n_chars"), 6).alias("len_avg"),
        F.round(F.stddev_samp("n_chars"), 6).alias("len_std"),
    )


@register(
    "source_lang_entropy",
    oracle="""
    WITH c AS (
      SELECT source, lang, count(*) AS n FROM documents GROUP BY 1, 2
    ),
    t AS (SELECT source, sum(n) AS tot FROM c GROUP BY source)
    SELECT c.source, CAST(t.tot AS BIGINT) AS n_docs,
           count(*) AS n_langs,
           round(-sum((CAST(n AS DOUBLE) / tot) * ln(CAST(n AS DOUBLE) / tot)), 6)
             AS lang_entropy
    FROM c JOIN t ON c.source = t.source
    GROUP BY c.source, t.tot
    """,
    doc="Per-source language entropy — the mixing diagnostic that flags "
    "monolingual crawl buckets (entropy ~0) vs balanced ones before "
    "setting per-language quotas. Two hash aggregates over (source, "
    "lang) counts; the corpus itself reduces map-side to |sources| x "
    "|langs| integer cells, and the only float math is the final "
    "p*ln(p) fold over exact integer ratios.",
)
def source_lang_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("source").agg(F.sum("n").alias("tot"))
    p = F.col("n").cast("double") / F.col("tot")
    return (
        c.join(t, "source")
        .groupBy("source", "tot")
        .agg(
            F.count(F.lit(1)).alias("n_langs"),
            F.round(-F.sum(p * F.log(p)), 6).alias("lang_entropy"),
        )
        .select(
            "source",
            F.col("tot").cast("bigint").alias("n_docs"),
            "n_langs",
            "lang_entropy",
        )
    )


_CHUNK, _STRIDE = 200, 150  # 50-char overlap


@register(
    "doc_chunks_overlap",
    oracle=f"""
    SELECT doc_id,
           CAST(s / {_STRIDE} AS BIGINT) AS chunk_id,
           s AS chunk_start,
           length(substr(text, s + 1, {_CHUNK})) AS chunk_len,
           substr(text, s + 1, {_CHUNK}) AS chunk_text
    FROM (
      SELECT doc_id, text,
             unnest(generate_series(0, length(text) - 1, {_STRIDE})) AS s
      FROM documents WHERE length(text) > 0
    )
    """,
    doc="Sliding-window document chunking (200-char chunks, 50-char "
    "overlap) — the context-window split every LLM training pipeline "
    "runs before tokenization. Chunk starts are generated per row with "
    "sequence() and exploded (JVM-side, no UDF, no join); the final "
    "short chunk is kept, empty docs are excluded on both engines. "
    "Fan-out is ceil(len/stride) — bounded by document length, linear "
    "in corpus size, embarrassingly parallel.",
)
def doc_chunks_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") > 0
    )
    starts = F.sequence(
        F.lit(0), F.length("text") - 1, F.lit(_STRIDE)
    )
    ex = docs.select("doc_id", "text", F.explode(starts).alias("s"))
    chunk = F.substring(F.col("text"), F.col("s") + 1, _CHUNK)
    return ex.select(
        "doc_id",
        (F.col("s") / _STRIDE).cast("bigint").alias("chunk_id"),
        F.col("s").alias("chunk_start"),
        F.length(chunk).alias("chunk_len"),
        chunk.alias("chunk_text"),
    )
