"""Text analysis for training-data pipelines — language ID, quality scoring,
token counting, document fingerprinting. Beyond reference parity (BASELINE.json
north star); operates on the ``documents`` table (doc_id, text, lang, source,
n_chars).

All operators are pure Catalyst expressions (no UDFs): at 100 TB these run
inside whole-stage codegen on the scan, shuffle only for the final rollups.
Counting idiom: ``(length(x) - length(replace(x, t, ''))) / length(t)``
occurrences — identical semantics in Spark SQL and DuckDB, used instead of
regexp_count whose regex dialects differ.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _n_occurrences(col, token: str):
    return (F.length(col) - F.length(F.replace(col, F.lit(token), F.lit("")))) / len(token)


def doc_stats(docs: DataFrame) -> DataFrame:
    """Per-document structural stats: chars, tokens, distinct tokens,
    type-token ratio, mean token length."""
    toks = F.split(F.col("text"), " ")
    n_toks = F.size(toks)
    n_chars = F.length("text")
    n_spaces = F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    return docs.select(
        "doc_id",
        "lang",
        "source",
        n_chars.alias("n_chars"),
        n_toks.alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.round(F.size(F.array_distinct(toks)).cast("double") / n_toks, 6).alias("type_token_ratio"),
        F.round((n_chars - n_spaces).cast("double") / n_toks, 6).alias("mean_token_len"),
    ).orderBy("doc_id")


DOC_STATS_SQL = """
SELECT doc_id, lang, source,
  length(text) AS n_chars,
  len(string_split(text, ' ')) AS n_tokens,
  len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
  round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / len(string_split(text, ' ')), 6) AS type_token_ratio,
  round(CAST(length(text) - (length(text) - length(replace(text, ' ', ''))) AS DOUBLE) / len(string_split(text, ' ')), 6) AS mean_token_len
FROM documents ORDER BY doc_id
"""


def quality_score(docs: DataFrame, min_tokens: int = 20, max_tokens: int = 80) -> DataFrame:
    """Heuristic quality score in [0,1]: length window + lexical diversity +
    stopword presence (the C4/Gopher-style rule family, deterministic form)."""
    toks = F.split(F.col("text"), " ")
    n_toks = F.size(toks)
    ttr = F.size(F.array_distinct(toks)).cast("double") / n_toks
    stop_hits = _n_occurrences(F.concat(F.lit(" "), F.col("text"), F.lit(" ")), " the ") + \
        _n_occurrences(F.concat(F.lit(" "), F.col("text"), F.lit(" ")), " a ")
    len_ok = (n_toks >= min_tokens) & (n_toks <= max_tokens)
    score = (
        F.when(len_ok, F.lit(0.4)).otherwise(F.lit(0.0))
        + F.least(ttr, F.lit(0.5)) * 0.6
        + F.when(stop_hits > 0, F.lit(0.3)).otherwise(F.lit(0.0))
    )
    return docs.select(
        "doc_id",
        n_toks.alias("n_tokens"),
        F.round(ttr, 6).alias("type_token_ratio"),
        stop_hits.cast("long").alias("stopword_hits"),
        F.round(F.least(score, F.lit(1.0)), 6).alias("quality_score"),
    ).orderBy("doc_id")


QUALITY_SCORE_SQL = """
SELECT doc_id,
  len(string_split(text, ' ')) AS n_tokens,
  round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / len(string_split(text, ' ')), 6) AS type_token_ratio,
  CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' the ', ''))) / 5
     + (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' a ', ''))) / 3 AS BIGINT) AS stopword_hits,
  round(least(
    (CASE WHEN len(string_split(text, ' ')) BETWEEN {min_tokens} AND {max_tokens} THEN 0.4 ELSE 0.0 END)
    + least(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / len(string_split(text, ' ')), 0.5) * 0.6
    + (CASE WHEN (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' the ', ''))) / 5
          + (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' a ', ''))) / 3 > 0
       THEN 0.3 ELSE 0.0 END), 1.0), 6) AS quality_score
FROM documents ORDER BY doc_id
"""


def gopher_filter(
    docs: DataFrame,
    min_words: int = 40,
    min_unique_frac: float = 0.5,
    min_stopword_frac: float = 0.02,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
) -> DataFrame:
    """Gopher-style document quality rules (the repetition/shape filter
    family from the Gopher/MassiveText data pipeline): word count window,
    unique-word fraction (repetition proxy), stopword presence, and mean
    word length band — each emitted per document with the combined
    pass/fail flag. All JVM-side array expressions; one narrow pass, no
    shuffle beyond the final sort."""
    toks = F.split(F.col("text"), " ")
    n_words = F.size(toks)
    uniq = F.size(F.array_distinct(toks)).cast("double") / n_words
    stop = (
        F.size(F.filter(toks, lambda t: (t == "a") | (t == "the"))).cast("double")
        / n_words
    )
    # single-space tokenization makes total word chars = len(text) - spaces
    mwl = (F.length("text") - n_words + 1).cast("double") / n_words
    passes = (
        (n_words >= min_words)
        & (uniq >= min_unique_frac)
        & (stop >= min_stopword_frac)
        & mwl.between(min_mean_word_len, max_mean_word_len)
    )
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(mwl, 6).alias("mean_word_len"),
        F.round(uniq, 6).alias("frac_unique_words"),
        F.round(stop, 6).alias("stopword_frac"),
        passes.cast("int").alias("passes"),
    ).orderBy("doc_id")


GOPHER_FILTER_SQL = """
WITH m AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_words,
         CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
           / len(string_split(text, ' ')) AS mwl,
         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
           / len(string_split(text, ' ')) AS uniq,
         CAST(len(list_filter(string_split(text, ' '), t -> t IN ('a', 'the'))) AS DOUBLE)
           / len(string_split(text, ' ')) AS stop
  FROM documents
)
SELECT doc_id, n_words,
       round(mwl, 6) AS mean_word_len,
       round(uniq, 6) AS frac_unique_words,
       round(stop, 6) AS stopword_frac,
       CAST(CASE WHEN n_words >= {min_words} AND uniq >= {min_unique_frac}
                  AND stop >= {min_stopword_frac}
                  AND mwl BETWEEN {min_mean_word_len} AND {max_mean_word_len}
            THEN 1 ELSE 0 END AS INT) AS passes
FROM m ORDER BY doc_id
"""


def lang_id(docs: DataFrame) -> DataFrame:
    """N-gram-heuristic language ID (marker-token frequency) with agreement
    check against the labeled ``lang`` column, rolled up per language."""
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    en_markers = (
        _n_occurrences(padded, " the ") + _n_occurrences(padded, " a ")
    )
    n_toks = F.size(F.split(F.col("text"), " "))
    pred = F.when(en_markers * 20 >= n_toks, F.lit("en")).otherwise(F.lit("other"))
    scored = docs.select("doc_id", "lang", pred.alias("pred_lang"))
    return (
        scored.groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "pred_lang")
    )


LANG_ID_SQL = """
SELECT lang, pred_lang, count(*) AS n_docs FROM (
  SELECT doc_id, lang,
    CASE WHEN ((length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' the ', ''))) / 5
             + (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' a ', ''))) / 3) * 20
             >= len(string_split(text, ' '))
         THEN 'en' ELSE 'other' END AS pred_lang
  FROM documents
) s GROUP BY lang, pred_lang ORDER BY lang, pred_lang
"""


def fingerprint(docs: DataFrame, prefix_tokens: int = 0) -> DataFrame:
    """Deterministic document fingerprint: md5 of the normalized text
    (or of the first N tokens when ``prefix_tokens`` > 0 — the prefix
    fingerprint used by exact near-dup grouping)."""
    if prefix_tokens:
        key = F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, prefix_tokens))
    else:
        key = F.lower(F.col("text"))
    return docs.select(
        "doc_id", F.md5(key).alias("fingerprint")
    ).orderBy("doc_id")


FINGERPRINT_SQL = """
SELECT doc_id, md5({key}) AS fingerprint
FROM documents ORDER BY doc_id
"""
FINGERPRINT_KEY_FULL = "lower(text)"
FINGERPRINT_KEY_PREFIX = "array_to_string(string_split(text, ' ')[1:{n}], ' ')"


# BPE-ish tokenization regex — letter runs, digit runs, single punctuation.
# Deliberately a dialect-neutral subset so Java regex (Spark) and RE2
# (DuckDB) agree character-for-character.
TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def token_counts(docs: DataFrame) -> DataFrame:
    """Token counting with a BPE-ish regex (whitespace split is ``doc_stats``;
    this is the subword-ish variant a tokenizer-budget estimate needs)."""
    toks = F.regexp_extract_all(F.col("text"), F.lit(TOKEN_REGEX), 0)
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_regex_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
        F.size(F.filter(toks, lambda t: t.rlike("^[0-9]+$"))).alias("n_number_tokens"),
    ).orderBy("doc_id")


TOKEN_COUNTS_SQL = """
SELECT doc_id,
  len(regexp_extract_all(text, '{rx}')) AS n_regex_tokens,
  len(list_distinct(regexp_extract_all(text, '{rx}'))) AS n_unique_tokens,
  len(list_filter(regexp_extract_all(text, '{rx}'), t -> regexp_matches(t, '^[0-9]+$'))) AS n_number_tokens
FROM documents ORDER BY doc_id
"""


def tf_idf(docs: DataFrame, terms: list[str]) -> DataFrame:
    """TF-IDF scores for the given terms across the corpus.

    Explode→aggregate inverted-index shape (term df's are the tiny side);
    idf = ln((N+1)/(df+1)) + 1 (smoothed). Scores rounded to 6dp — log/exp
    come from each engine's libm, identical to well past 6 significant
    decimals for these magnitudes.
    """
    n_docs = docs.count()
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = (
        toks.filter(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log((F.lit(n_docs) + 1.0) / (F.col("df") + 1.0)) + 1.0
    return (
        tf.join(df_.withColumn("idf", idf).select("term", "idf"), "term")
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(F.col("tf") * F.col("idf"), 6).alias("tf_idf"),
        )
        .orderBy("doc_id", "term")
    )


TF_IDF_SQL = """
WITH tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents) t
  WHERE term IN ({terms})
  GROUP BY doc_id, term
),
dfreq AS (
  SELECT term, count(*) AS df,
         ln(((SELECT count(*) FROM documents) + 1.0) / (count(*) + 1.0)) + 1.0 AS idf
  FROM tf GROUP BY term
)
SELECT tf.doc_id, tf.term, tf.tf, round(tf.tf * dfreq.idf, 6) AS tf_idf
FROM tf JOIN dfreq ON tf.term = dfreq.term
ORDER BY tf.doc_id, tf.term
"""


def bm25(docs: DataFrame, terms: list[str], k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """BM25 relevance of every matching document for a bag-of-words query —
    the retrieval scorer a training-data curation pipeline uses for
    quality-targeted sampling."""
    n_docs = docs.count()
    with_len = docs.withColumn("dl", F.size(F.split("text", " ")))
    avgdl = with_len.agg(F.avg("dl")).collect()[0][0]
    toks = with_len.select(
        "doc_id", "dl", F.explode(F.split("text", " ")).alias("term")
    )
    tf = (
        toks.filter(F.col("term").isin(terms))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = F.log(
        (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    contrib = F.col("idf") * (
        F.col("tf") * (k1 + 1)
    ) / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / avgdl))
    return (
        tf.join(df_.withColumn("idf", idf).select("term", "idf"), "term")
        .withColumn("contrib", contrib)
        .groupBy("doc_id")
        .agg(F.round(F.sum("contrib"), 6).alias("bm25"))
        .orderBy("doc_id")
    )


BM25_SQL = """
WITH dl AS (
  SELECT doc_id, text, len(string_split(text, ' ')) AS dl FROM documents
),
stats AS (
  SELECT count(*) AS n, avg(dl) AS avgdl FROM dl
),
tf AS (
  SELECT doc_id, dl, term, count(*) AS tf
  FROM (SELECT doc_id, dl, unnest(string_split(text, ' ')) AS term FROM dl) t
  WHERE term IN ({terms})
  GROUP BY doc_id, dl, term
),
dfreq AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term
)
SELECT tf.doc_id,
  round(SUM(
    ln(((SELECT n FROM stats) - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
    * (tf.tf * ({k1} + 1))
    / (tf.tf + {k1} * (1 - {b} + {b} * tf.dl / (SELECT avgdl FROM stats)))
  ), 6) AS bm25
FROM tf JOIN dfreq ON tf.term = dfreq.term
GROUP BY tf.doc_id
ORDER BY tf.doc_id
"""


def chunk_documents(docs: DataFrame, size: int = 32, overlap: int = 8) -> DataFrame:
    """Split each document into overlapping token-window chunks — the
    standard pre-embedding / pre-training segmentation. Chunk i covers
    tokens [i·step+1, i·step+size] (step = size−overlap); every document
    yields ≥1 chunk (short docs yield themselves).

    Pure JVM: split → sequence → transform → posexplode; no UDF. At 100 TB
    the explode multiplies rows ~len/step× but stays pipelined inside
    whole-stage codegen — no shuffle until a downstream aggregation.
    """
    step = size - overlap
    if step <= 0:
        raise ValueError("overlap must be smaller than size")
    toks = F.split(F.col("text"), " ")
    n_chunks = F.greatest(
        (F.ceil((F.size(toks) - F.lit(size)) / F.lit(float(step)))).cast("long") + 1,
        F.lit(1).cast("long"),
    )
    chunks = F.transform(
        F.sequence(F.lit(0).cast("long"), n_chunks - 1),
        lambda i: F.struct(
            F.concat_ws(" ", F.slice(toks, (i * step + 1).cast("int"), size)).alias(
                "chunk_text"
            ),
            F.size(F.slice(toks, (i * step + 1).cast("int"), size)).alias(
                "n_chunk_tokens"
            ),
        ),
    )
    return (
        docs.select("doc_id", F.posexplode(chunks).alias("chunk_index", "c"))
        .select(
            "doc_id",
            "chunk_index",
            F.col("c.chunk_text").alias("chunk_text"),
            F.col("c.n_chunk_tokens").alias("n_chunk_tokens"),
        )
        .orderBy("doc_id", "chunk_index")
    )


CHUNK_DOCUMENTS_SQL = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
n AS (
  SELECT doc_id, toks,
         greatest(CAST(ceil((len(toks) - {size}) / CAST({step} AS DOUBLE)) AS BIGINT) + 1,
                  1) AS nch
  FROM t
)
, idx AS (
  SELECT doc_id, toks, unnest(range(0, nch)) AS i FROM n
)
SELECT doc_id, i AS chunk_index,
       array_to_string(toks[(i * {step} + 1):(i * {step} + {size})], ' ') AS chunk_text,
       len(toks[(i * {step} + 1):(i * {step} + {size})]) AS n_chunk_tokens
FROM idx
ORDER BY doc_id, chunk_index
"""


#: PII / secret patterns — identical RE2-compatible syntax in Spark (Java
#: regex) and DuckDB (RE2): email addresses, 32+-hex-digit secrets,
#: SSN/phone-shaped digit groups, and 13-19-digit card-shaped runs.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "hex_secret": r"\b[0-9a-fA-F]{32,}\b",
    "phone_ssn": r"\b[0-9]{3}[- ][0-9]{2,4}[- ][0-9]{4}\b",
    "card_number": r"\b[0-9]{13,19}\b",
}


def redact_pii(docs: DataFrame, replacement: str = "[REDACTED]") -> DataFrame:
    """Scrub PII/secret patterns from document text; emit per-pattern match
    counts and the scrubbed text's char count (training-data hygiene pass).

    All JVM-side regexp_extract_all/regexp_replace — counting and rewriting
    happen in one projection, no UDF, no shuffle.
    """
    out = docs.select("doc_id", "text")
    clean = F.col("text")
    for name, pat in PII_PATTERNS.items():
        out = out.withColumn(
            f"n_{name}", F.size(F.regexp_extract_all("text", F.lit(pat), F.lit(0)))
        )
        clean = F.regexp_replace(clean, pat, replacement)
    return (
        out.withColumn("clean_chars", F.length(clean))
        .select(
            "doc_id",
            *[f"n_{name}" for name in PII_PATTERNS],
            "clean_chars",
        )
        .orderBy("doc_id")
    )


def _redact_sql(replacement: str = "[REDACTED]") -> str:
    counts = ",\n       ".join(
        f"len(regexp_extract_all(text, '{pat}')) AS n_{name}"
        for name, pat in PII_PATTERNS.items()
    )
    clean = "text"
    for pat in PII_PATTERNS.values():
        clean = f"regexp_replace({clean}, '{pat}', '{replacement}', 'g')"
    return (
        f"SELECT doc_id,\n       {counts},\n"
        f"       length({clean}) AS clean_chars\n"
        "FROM documents ORDER BY doc_id"
    )


def quality_percentiles(docs: DataFrame) -> DataFrame:
    """Per-language corpus length percentiles (p50/p90/p99 of n_chars) —
    the summary a curation pass thresholds against. Exact linear-interpolated
    percentile (Spark ``percentile`` == DuckDB ``quantile_cont``); at 100 TB
    swap to ``percentile_approx`` and re-validate tolerance."""
    pct = F.expr("percentile(CAST(n_chars AS DOUBLE), array(0.5D, 0.9D, 0.99D))")
    return (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), pct.alias("p"))
        .select(
            "lang",
            "n_docs",
            F.round(F.col("p")[0], 6).alias("p50_chars"),
            F.round(F.col("p")[1], 6).alias("p90_chars"),
            F.round(F.col("p")[2], 6).alias("p99_chars"),
        )
        .orderBy("lang")
    )


QUALITY_PERCENTILES_SQL = """
SELECT lang, count(*) AS n_docs,
       round(quantile_cont(CAST(n_chars AS DOUBLE), 0.5), 6) AS p50_chars,
       round(quantile_cont(CAST(n_chars AS DOUBLE), 0.9), 6) AS p90_chars,
       round(quantile_cont(CAST(n_chars AS DOUBLE), 0.99), 6) AS p99_chars
FROM documents
GROUP BY lang
ORDER BY lang
"""


def pack_documents(
    docs: DataFrame, budget_tokens: int = 512, n_buckets: int = 32
) -> DataFrame:
    """Sequence packing: assign documents to fixed-token-budget packs — the
    batch-construction step of an LLM training pipeline (concatenate docs,
    emit ~budget-token training sequences).

    Global greedy bin packing is inherently sequential, so the distributed
    form packs WITHIN hash buckets: docs hash-partition into ``n_buckets``
    independent streams, each stream orders by a hash (so pack contents are
    deterministic but uncorrelated with doc order) and assigns
    ``pack_seq = (running_tokens_before_doc) div budget`` — one shuffle, one
    window pass. A doc straddling a boundary overflows its assigned pack;
    pair with ``chunk_documents`` upstream to bound per-doc length. The
    bucket count trades packing slack (one partial pack per bucket) for
    parallelism — at 100 TB use buckets ≈ cores, slack stays O(buckets·budget)
    tokens, and no stream is ever collected to one reducer.
    """
    t = docs.select(
        "doc_id",
        (F.col("doc_id") % n_buckets).alias("bucket"),
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("_h"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("_h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        t.withColumn("_cum", F.sum("n_tokens").over(w))
        .select(
            "doc_id",
            "bucket",
            "n_tokens",
            F.expr(f"(_cum - n_tokens) div {int(budget_tokens)}").alias("pack_seq"),
        )
        .orderBy("bucket", "pack_seq", "doc_id")
    )


PACK_DOCUMENTS_SQL = """
WITH t AS (
  SELECT doc_id, doc_id % {n_buckets} AS bucket,
         len(string_split(text, ' ')) AS n_tokens,
         md5(CAST(doc_id AS VARCHAR)) AS h
  FROM documents
),
c AS (
  SELECT doc_id, bucket, n_tokens,
    SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY h, doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM t
)
SELECT doc_id, bucket, n_tokens,
  CAST((cum - n_tokens) // {budget} AS BIGINT) AS pack_seq
FROM c ORDER BY bucket, pack_seq, doc_id
"""


def intra_doc_repetition(docs: DataFrame) -> DataFrame:
    """Per-document repetition signals — the within-document half of the
    Gopher/MassiveText repetition-filter family (the cross-document half is
    ``dedup.dup_ngram_stats``): most-frequent-word count, duplicate word
    instances, and the same pair of signals over adjacent word bigrams
    (the "top n-gram" / "duplicate n-gram" fractions, kept as INTEGER
    numerators so the oracle hash is float-free; callers divide by n_words
    / n_bigrams for the published fractions).

    Entirely JVM-side higher-order functions over the token array — one
    narrow pass per document, NO shuffle (the most-frequent count is the
    longest equal-run of the sorted token array, not a groupBy): per-doc
    work is O(n log n) in document length, so the operator scales linearly
    with corpus size at any document-length distribution."""

    def longest_run(arr):
        # longest run of equal adjacent elements in a SORTED array ==
        # max multiplicity of any element
        step = lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc.best,
                F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1)),
            ).alias("best"),
        )
        init = F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        )
        return F.aggregate(arr, init, step, lambda acc: acc.best)

    words = F.split(F.col("text"), " ")
    bigrams = F.zip_with(
        F.slice(words, 1, F.greatest(F.size(words) - 1, F.lit(0))),
        F.slice(words, 2, F.greatest(F.size(words) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return docs.select(
        "doc_id",
        F.size(words).alias("n_words"),
        longest_run(F.array_sort(words)).alias("top_word_count"),
        (F.size(words) - F.size(F.array_distinct(words))).alias("n_dup_word_instances"),
        F.size(bigrams).alias("n_bigrams"),
        longest_run(F.array_sort(bigrams)).alias("top_bigram_count"),
        (F.size(bigrams) - F.size(F.array_distinct(bigrams))).alias(
            "n_dup_bigram_instances"
        ),
    ).orderBy("doc_id")


INTRA_DOC_REPETITION_SQL = """
WITH w AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS word,
         generate_subscripts(string_split(text, ' '), 1) AS idx
  FROM documents
),
bg AS (
  SELECT doc_id,
         word || ' ' || lead(word) OVER (PARTITION BY doc_id ORDER BY idx) AS bigram
  FROM w
),
wc AS (SELECT doc_id, word, count(*) AS c FROM w GROUP BY doc_id, word),
bc AS (
  SELECT doc_id, bigram, count(*) AS c FROM bg
  WHERE bigram IS NOT NULL GROUP BY doc_id, bigram
),
wa AS (
  SELECT doc_id, sum(c) AS n_words, max(c) AS top_word_count,
         sum(c) - count(*) AS n_dup_word_instances
  FROM wc GROUP BY doc_id
),
ba AS (
  SELECT doc_id, sum(c) AS n_bigrams, max(c) AS top_bigram_count,
         sum(c) - count(*) AS n_dup_bigram_instances
  FROM bc GROUP BY doc_id
)
SELECT wa.doc_id,
       CAST(wa.n_words AS BIGINT) AS n_words,
       CAST(wa.top_word_count AS BIGINT) AS top_word_count,
       CAST(wa.n_dup_word_instances AS BIGINT) AS n_dup_word_instances,
       CAST(coalesce(ba.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(coalesce(ba.top_bigram_count, 0) AS BIGINT) AS top_bigram_count,
       CAST(coalesce(ba.n_dup_bigram_instances, 0) AS BIGINT) AS n_dup_bigram_instances
FROM wa LEFT JOIN ba USING (doc_id)
ORDER BY wa.doc_id
"""
