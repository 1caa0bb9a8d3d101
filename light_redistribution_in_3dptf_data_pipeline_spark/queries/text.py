"""Text-analysis + deduplication queries over `documents` (SURVEY
Phase 6 — the training-data-pipeline extensions).

All counting is integer-exact (token counts, stopword hits), divisions
happen once at the end, so Spark↔DuckDB parity is bit-exact. The
n-gram near-dup query is the SQL-expressible baseline; the MinHash-LSH
scale path lives in ``operators/dedup.py`` (rows-only checked).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import register

STOPWORDS = ("a", "the")
JACCARD_THRESHOLD = 0.35


# Winnowing fingerprint (Schleimer/Wilkerson/Aiken MOSS scheme):
# Rabin-Karp rolling hash over K-char grams (mod-Horner, BIGINT-safe),
# per-window minima over W consecutive gram hashes, distinct minima =
# the document's fingerprint set. All-integer and codepoint-based
# (ascii() = unicode codepoint in BOTH engines), so Spark and DuckDB
# agree bit-for-bit on any text.
WINNOW_K = 8           # k-gram width (chars)
WINNOW_W = 4           # winnowing window (grams)
WINNOW_B = 257         # polynomial base
WINNOW_M = 1_000_000_007  # modulus (Horner step stays < 2^40)


def _winnow_horner_sql(pos: str, text: str = "text") -> str:
    """Unrolled mod-Horner K-gram hash at 1-based position ``pos``."""
    e = "CAST(0 AS BIGINT)"
    for j in range(WINNOW_K):
        e = (f"((({e}) * {WINNOW_B} "
             f"+ ascii(substr({text}, {pos} + {j}, 1))) % {WINNOW_M})")
    return e


def with_winnow_fingerprints(df: DataFrame, text_col: str = "text",
                             out: str = "winnow_fps") -> DataFrame:
    """Append the distinct winnowed fingerprint ARRAY of ``text_col``
    as column ``out``. In-row arrays only (transform/slice/array_min)
    — a pure map at any scale. Consumers: the tx1/tx4 scalar stats
    (:func:`with_winnow_stats`) and the passage-duplicate index
    (operators/dedup.winnow_fingerprint_rows, which explodes it).

    STAGING MATTERS: the rolling-hash array, the window minima and
    the distinct set are bound as intermediate COLUMNS, not inlined
    subtrees. Higher-order-function lambdas are interpreted (not
    codegen'd), and an inlined ``rh`` subtree inside the window
    lambda re-evaluates the whole O(len·K) hash scan once per window
    — O(len²·K) per document, measured ~1 s/doc. As multi-use
    non-cheap aliases, CollapseProject keeps them materialized:
    each array computes once per row and the whole stage is
    O(len·K + windows·W)."""
    text = F.col(text_col)
    empty = F.array().cast("array<bigint>")

    # Codepoint array first, via one split pass: substring(text, i, 1)
    # seeks codepoints from the string start (O(i) each), so hashing
    # straight off the string is O(len²) per document. split('') is a
    # single linear pass; everything after is pure integer-array work.
    cps_expr = F.transform(
        F.split(text, ""),
        lambda c: F.ascii(c).cast("bigint"))

    # Length conditions read size(_cps), not length(text): the alias
    # must appear MORE than once in the consuming projection, or
    # CollapseProject inlines it into the per-position lambda and the
    # array is rebuilt for every gram — O(len³) per doc (measured:
    # worse than the string-seek version it replaces).
    n_cp = F.size(F.col("_cps"))
    rh_expr = F.when(
        n_cp >= WINNOW_K,
        F.transform(
            F.sequence(F.lit(1), n_cp - WINNOW_K + 1),
            lambda i: F.aggregate(
                F.slice(F.col("_cps"), i, WINNOW_K),
                F.lit(0).cast("bigint"),
                lambda h, c: (h * F.lit(WINNOW_B) + c)
                % F.lit(WINNOW_M)))).otherwise(empty)

    n = F.size(F.col("_rh"))
    wins_expr = (
        F.when(n == 0, empty)
        .when(n < WINNOW_W, F.array(F.array_min(F.col("_rh"))))
        .otherwise(F.transform(
            F.sequence(F.lit(1), n - WINNOW_W + 1),
            lambda i: F.array_min(F.slice(F.col("_rh"), i, WINNOW_W)))))

    return (df.withColumn("_cps", cps_expr)
              .withColumn("_rh", rh_expr)
              .withColumn(out, F.array_distinct(wins_expr))
              .drop("_cps", "_rh"))


def with_winnow_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append ``n_winnow_fp`` / ``winnow_digest`` (set size + exact
    sum of the distinct winnowed hashes) — the tx1/tx4 scalar fold of
    :func:`with_winnow_fingerprints` (staging notes there)."""
    fps = F.col("_fps")
    return (with_winnow_fingerprints(df, text_col, out="_fps")
            .withColumn("n_winnow_fp", F.size(fps).cast("bigint"))
            .withColumn("winnow_digest",
                        F.coalesce(
                            F.aggregate(fps, F.lit(0).cast("bigint"),
                                        lambda a, x: a + x),
                            F.lit(0).cast("bigint")))
            .drop("_fps"))


@register(
    "tx1_tx2_tx4_token_quality",
    f"""
    WITH t AS (
      SELECT doc_id, text,
             string_split_regex(trim(text), '\\s+') AS toks
      FROM documents
    ), c AS (
      SELECT doc_id, text,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CAST(len(list_filter(toks,
                  x -> x IN {STOPWORDS})) AS BIGINT) AS n_stop
      FROM t
    ), r AS (
      SELECT *, CASE WHEN length(text) < {WINNOW_K} THEN []
                     ELSE list_transform(
                       range(1, length(text) - {WINNOW_K} + 2),
                       i -> {_winnow_horner_sql('i')})
                END AS rh
      FROM c
    ), w AS (
      SELECT *, list_distinct(
               CASE WHEN len(rh) = 0 THEN []
                    WHEN len(rh) < {WINNOW_W} THEN [list_min(rh)]
                    ELSE list_transform(
                      range(1, len(rh) - {WINNOW_W} + 2),
                      i -> list_min(rh[i:i+{WINNOW_W}-1]))
               END) AS fps
      FROM r
    )
    SELECT doc_id, n_tokens, n_stop,
           CAST(length(text) AS BIGINT) AS n_chars_len,
           CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_nonspace,
           CAST(n_stop AS DOUBLE) / n_tokens AS stopword_ratio,
           CAST(n_stop AS DOUBLE) / n_tokens >= 0.02 AS quality_pass,
           substr(md5(lower(text)), 1, 16) AS fingerprint,
           CAST(len(fps) AS BIGINT) AS n_winnow_fp,
           CAST(coalesce(list_sum(fps), 0) AS BIGINT) AS winnow_digest
    FROM w
    """,
    doc="Text per-doc pass: token counting (whitespace tokenizer) + "
        "char stats, quality scoring (stopword-ratio feature + "
        "threshold gate), and document fingerprinting two ways — the "
        "normalized-content digest prefix (compact join/dedup key) "
        "AND a MOSS-style winnowing fingerprint (Rabin-Karp rolling "
        "hash over 8-char grams, window-4 minima, distinct set; "
        "reported as set size + exact sum digest so the output stays "
        "scalar) — the per-document feature extraction of an LLM "
        "data pipeline in ONE scan; all counting integer-exact and "
        "codepoint-based so both engines agree on any script")
def token_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    c = docs.select(
        "doc_id", "text",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
         .cast("bigint").alias("n_stop"),
    )
    from ..udf.winnow import with_winnow_stats_arrow

    ratio = F.col("n_stop").cast("double") / F.col("n_tokens")
    # Arrow fast path for the per-char winnowing loop (~100x the
    # interpreted HOF Column form); bit-equivalence with the Column
    # algebra the oracle restates is pinned by tests/test_winnow.py.
    return with_winnow_stats_arrow(c).select(
        "doc_id", "n_tokens", "n_stop",
        F.length("text").cast("bigint").alias("n_chars_len"),
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
         .cast("bigint").alias("n_nonspace"),
        ratio.alias("stopword_ratio"),
        (ratio >= 0.02).alias("quality_pass"),
        F.substring(F.md5(F.lower(F.col("text")).cast("binary")), 1, 16)
         .alias("fingerprint"),
        "n_winnow_fp", "winnow_digest",
    )


@register(
    "tx3_dedup_exact",
    """
    SELECT md5(text) AS content_hash,
           CAST(count(*) AS BIGINT) AS n_copies,
           CAST(min(doc_id) AS BIGINT) AS keep_doc_id
    FROM documents
    GROUP BY 1
    """,
    doc="Dedup (exact): hash-groupBy on content; keep_doc_id = the "
        "survivor under keep-first policy. At 100 TB this is one "
        "shuffle on a 128-bit key — the cheapest dedup there is")
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (docs.groupBy(F.md5(F.col("text").cast("binary"))
                          .alias("content_hash"))
                .agg(F.count("*").cast("bigint").alias("n_copies"),
                     F.min("doc_id").cast("bigint").alias("keep_doc_id")))


@register(
    "tx5_lang_stopword_signal",
    """
    WITH t AS (
      SELECT doc_id, lang,
             string_split_regex(trim(text), '\\s+') AS toks
      FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(list_filter(toks, x -> x IN ('the', 'a'))) * 1000
                    // len(toks)) AS BIGINT) AS permille_sum
    FROM t
    GROUP BY lang
    """,
    doc="Text: language-ID signal — per-language aggregate of an "
        "n-gram/stopword heuristic feature (integer permille so the "
        "aggregate is exact)")
def lang_stopword_signal(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_stop = F.size(F.filter(toks, lambda x: x.isin("the", "a")))
    permille = F.floor((n_stop * 1000) / F.size(toks))
    return (docs.select("lang", permille.alias("pm"))
                .groupBy("lang")
                .agg(F.count("*").cast("bigint").alias("n_docs"),
                     F.sum("pm").cast("bigint").alias("permille_sum")))


# Gates sit at ~p90 of each metric on the synthetic fixture so the
# composite flag splits the corpus non-trivially (a constant-False
# gate would make the parity check vacuous for this column).
TOP_TOKEN_RATIO_GATE = 0.14
DUP_2GRAM_GATE = 0.06


@register(
    "tx7_repetition_signals",
    f"""
    WITH t AS (
      SELECT doc_id,
             string_split_regex(trim(text), '\\s+') AS toks
      FROM documents
    ), tok AS (
      SELECT doc_id, unnest(toks) AS tok,
             generate_subscripts(toks, 1) AS pos
      FROM t
    ), cnt AS (
      SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY doc_id, tok
    ), agg AS (
      SELECT doc_id,
             CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_distinct,
             CAST(max(c) AS BIGINT) AS top_tok_count
      FROM cnt GROUP BY doc_id
    ), g AS (
      SELECT doc_id,
             tok || ' ' || lead(tok) OVER (PARTITION BY doc_id
                                           ORDER BY pos) AS sh
      FROM tok
    ), g2 AS (
      SELECT doc_id,
             CAST(count(sh) AS BIGINT) AS n_2grams,
             CAST(count(DISTINCT sh) AS BIGINT) AS n_2grams_distinct
      FROM g WHERE sh IS NOT NULL GROUP BY doc_id
    )
    SELECT a.doc_id, a.n_tokens, a.n_distinct, a.top_tok_count,
           g2.n_2grams, g2.n_2grams_distinct,
           CAST(a.n_distinct AS DOUBLE) / a.n_tokens AS type_token_ratio,
           CAST(a.top_tok_count AS DOUBLE) / a.n_tokens AS top_tok_ratio,
           CAST(g2.n_2grams - g2.n_2grams_distinct AS DOUBLE)
             / g2.n_2grams AS dup_2gram_frac,
           CAST(a.top_tok_count AS DOUBLE) / a.n_tokens
               > {TOP_TOKEN_RATIO_GATE}
             OR CAST(g2.n_2grams - g2.n_2grams_distinct AS DOUBLE)
                  / g2.n_2grams > {DUP_2GRAM_GATE} AS repetitive
    FROM agg a JOIN g2 ON g2.doc_id = a.doc_id
    """,
    doc="Text quality (repetition): Gopher-style repetition filters — "
        "type-token ratio, most-frequent-token fraction, duplicate-"
        "2-gram fraction, and the composite repetitive gate. Token "
        "counts via ONE explode + (doc,tok) groupBy (integer-exact, "
        "map-side combinable); 2-gram duplicate stats are ARRAY-NATIVE "
        "per-row (size minus size(array_distinct) of the in-row "
        "shingle array — no second explode, no window sort). At "
        "100 TB both shuffles key on doc token frequencies, no "
        "skew beyond document length")
def repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import ngram_shingles, whitespace_tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id",
                       whitespace_tokens(F.col("text")).alias("toks"))
    agg = (toks.select("doc_id", F.explode("toks").alias("tok"))
           .groupBy("doc_id", "tok")
           .agg(F.count("*").alias("c"))
           .groupBy("doc_id")
           .agg(F.sum("c").cast("bigint").alias("n_tokens"),
                F.count("*").cast("bigint").alias("n_distinct"),
                F.max("c").cast("bigint").alias("top_tok_count")))
    sh2 = ngram_shingles(F.col("toks"), 2, distinct=False)
    # Match the oracle's WHERE sh IS NOT NULL semantics (sub-2-token
    # docs have no 2-grams and no row) with a filter on the CHEAP
    # token count, applied BEFORE the shingle projection. Filtering on
    # n_2grams>0 instead lets predicate pushdown rewrite the filter in
    # terms of the unmaterialized split() expression — which then
    # re-tokenizes the text per array element inside the shingle
    # lambda, an O(L²) regex blowup per document (measured 4x on this
    # query at sf0.1).
    g2 = (toks.filter(F.size("toks") > 1)
          .select(
              "doc_id",
              F.size(sh2).cast("bigint").alias("n_2grams"),
              F.size(F.array_distinct(sh2)).cast("bigint")
               .alias("n_2grams_distinct")))
    j = agg.join(g2, "doc_id")
    top_ratio = F.col("top_tok_count").cast("double") / F.col("n_tokens")
    dup_frac = ((F.col("n_2grams") - F.col("n_2grams_distinct"))
                .cast("double") / F.col("n_2grams"))
    return j.select(
        "doc_id", "n_tokens", "n_distinct", "top_tok_count",
        "n_2grams", "n_2grams_distinct",
        (F.col("n_distinct").cast("double") / F.col("n_tokens"))
        .alias("type_token_ratio"),
        top_ratio.alias("top_tok_ratio"),
        dup_frac.alias("dup_2gram_frac"),
        ((top_ratio > TOP_TOKEN_RATIO_GATE)
         | (dup_frac > DUP_2GRAM_GATE)).alias("repetitive"))


# Eval-set membership: a deterministic hash-free predicate so both
# engines pick the identical benchmark slice.
EVAL_MOD = 97


@register(
    "tx8_benchmark_decontam",
    f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split_regex(trim(text), '\\s+')) AS tok,
             generate_subscripts(string_split_regex(trim(text), '\\s+'), 1)
               AS pos
      FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id,
             tok || ' ' || lead(tok, 1) OVER w || ' '
                 || lead(tok, 2) OVER w AS shingle
      FROM toks
      WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ), sh2 AS (
      SELECT doc_id, shingle FROM sh WHERE shingle IS NOT NULL
    ), ev AS (
      SELECT doc_id, shingle FROM sh2 WHERE doc_id % {EVAL_MOD} = 0
    ), tr AS (
      SELECT doc_id, shingle FROM sh2 WHERE doc_id % {EVAL_MOD} <> 0
    )
    SELECT tr.doc_id,
           CAST(count(DISTINCT tr.shingle) AS BIGINT) AS n_shared,
           CAST(count(DISTINCT ev.doc_id) AS BIGINT) AS n_eval_hit
    FROM tr JOIN ev ON ev.shingle = tr.shingle
    GROUP BY tr.doc_id
    """,
    doc="Benchmark decontamination: flag training documents sharing "
        "any 3-gram shingle with the held-out eval slice "
        "(doc_id % 97 == 0), reporting how many distinct shingles "
        "leak and how many eval docs are hit. The eval side is tiny "
        "by construction (benchmarks are MBs, corpora are TBs), so "
        "the Spark plan BROADCASTS the eval shingle set — the 100 TB "
        "side streams through a map-side hash join with zero shuffle "
        "of the corpus; only the per-doc count-distinct aggregation "
        "shuffles, keyed on contaminated docs only (a tiny fraction)")
def benchmark_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import ngram_shingles, whitespace_tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id",
                       whitespace_tokens(F.col("text")).alias("toks"))
    sh = toks.select("doc_id",
                     F.explode(ngram_shingles(F.col("toks"), 3))
                      .alias("shingle"))
    ev = (sh.filter(F.col("doc_id") % EVAL_MOD == 0)
            .select(F.col("doc_id").alias("eval_doc_id"), "shingle"))
    tr = sh.filter(F.col("doc_id") % EVAL_MOD != 0)
    return (tr.join(F.broadcast(ev), "shingle")
              .groupBy("doc_id")
              .agg(F.countDistinct("shingle").cast("bigint")
                    .alias("n_shared"),
                   F.countDistinct("eval_doc_id").cast("bigint")
                    .alias("n_eval_hit")))


@register(
    "tx9_tfidf_vocab",
    """
    WITH tok AS (
      SELECT doc_id,
             unnest(string_split_regex(trim(text), '\\s+')) AS tok
      FROM documents
    ), agg AS (
      SELECT tok,
             CAST(count(*) AS BIGINT) AS tf,
             CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      FROM tok GROUP BY tok
    ), n AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents
    )
    SELECT tok, tf, df,
           round(ln(CAST(n_docs AS DOUBLE) / df), 6) + 0.0 AS idf
    FROM agg, n
    ORDER BY df DESC, tok
    LIMIT 100
    """,
    doc="Corpus vocabulary + TF-IDF weights: per-token corpus "
        "frequency (tf), document frequency (df), and idf = "
        "ln(N/df) for the top-100 tokens by df (tie-broken on the "
        "token so the top-k SET is deterministic; idf rounded to "
        "12 dp — JVM vs libm ln may differ in the last ulp). One "
        "explode + one map-side-combinable groupBy; the corpus-size "
        "scalar joins in as a broadcast single row; top-k plans as "
        "TakeOrderedAndProject — no global sort at 100 TB")
def tfidf_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import whitespace_tokens

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id",
                      F.explode(whitespace_tokens(F.col("text")))
                       .alias("tok"))
    agg = (tok.groupBy("tok")
              .agg(F.count("*").cast("bigint").alias("tf"),
                   F.countDistinct("doc_id").cast("bigint").alias("df")))
    n = docs.agg(F.count("*").cast("bigint").alias("n_docs"))
    # idf rounds at 6 decimals, NOT finer: ln() is not correctly
    # rounded (JVM and DuckDB differ by 1 ulp on ~1% of inputs), and
    # the probability the true value sits within an ulp of a rounding
    # boundary scales with 10^digits — ~4e-4 per value at 12 digits
    # (a deterministic driver mismatch waiting on a fixture regen)
    # vs ~4e-10 at 6. tests/test_cross_engine_numerics.py carries the
    # fixture canary.
    idf = (F.round(F.log(F.col("n_docs").cast("double") / F.col("df")),
                   6) + F.lit(0.0))
    return (agg.crossJoin(F.broadcast(n))
               .select("tok", "tf", "df", idf.alias("idf"))
               .orderBy(F.desc("df"), F.asc("tok"))
               .limit(100))


NEARDUP_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(text), '\\s+')) AS tok,
         generate_subscripts(string_split_regex(trim(text), '\\s+'), 1)
           AS pos
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
         tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w
           AS shingle
  FROM toks
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
), sh2 AS (
  SELECT doc_id, shingle FROM sh WHERE shingle IS NOT NULL
), sizes AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM sh2 GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(count(*) AS BIGINT) AS n_inter
  FROM sh2 a JOIN sh2 b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b, i.n_inter,
       CAST(i.n_inter AS DOUBLE)
         / (sa.n_sh + sb.n_sh - i.n_inter) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE CAST(i.n_inter AS DOUBLE)
        / (sa.n_sh + sb.n_sh - i.n_inter) >= {JACCARD_THRESHOLD}
"""


@register(
    "tx6_ngram_jaccard_neardup",
    NEARDUP_ORACLE,
    doc="Dedup (near): 3-gram shingle Jaccard similarity — the "
        "exhaustive baseline. The pairwise join explodes at 100 TB; "
        "the scale path is MinHash+LSH banding (operators/dedup.py) "
        "whose candidate pairs are a superset of these above-threshold "
        "pairs")
def ngram_jaccard_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # Array-native shingling: build all 3-grams with an indexed
    # transform and dedupe *inside the row* (array_distinct), so the
    # only shuffle left in this subtree is none at all — no per-doc
    # window sort, no global DISTINCT exchange. Matters doubly because
    # the self-join below evaluates this subtree twice.
    from ..functions import ngram_shingles, whitespace_tokens

    toks = docs.select("doc_id", whitespace_tokens(F.col("text"))
                       .alias("toks"))
    # One explicit exchange on the join key: both sides of the self-
    # join below and the sizes agg reuse this single shuffle (Spark's
    # ReuseExchange), and the shingle-equality join needs no further
    # exchange — measured ~25% faster than the window+DISTINCT
    # formulation and ~2x faster than leaving the flat map bare.
    sh = (toks.select("doc_id",
                      F.explode(ngram_shingles(F.col("toks"), 3))
                       .alias("shingle"))
              .repartition(F.col("shingle")))
    sizes = sh.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
              .groupBy(F.col("a.doc_id").alias("doc_a"),
                       F.col("b.doc_id").alias("doc_b"))
              .agg(F.count("*").cast("bigint").alias("n_inter")))
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = (F.col("n_inter").cast("double")
           / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_inter")))
    return (inter.join(F.broadcast(sa),
                       F.col("doc_a") == F.col("sa.doc_id"))
                 .join(F.broadcast(sb),
                       F.col("doc_b") == F.col("sb.doc_id"))
                 .select("doc_a", "doc_b", "n_inter", jac.alias("jaccard"))
                 .filter(F.col("jaccard") >= JACCARD_THRESHOLD))


# GPT-2-style pre-tokenizer, simplified to the lookahead-free subset
# both regex engines (Java in Spark, RE2 in DuckDB) treat identically:
# contractions, space-prefixed letter runs, digit runs, punctuation
# runs. Whitespace between tokens is not itself a token.
BPE_TOKEN_PATTERN = (
    "('s|'t|'re|'ve|'m|'ll|'d"
    "| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+)"
)


@register(
    "tx10_bpe_token_count",
    f"""
    WITH t AS (
      SELECT doc_id,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
               AS n_ws_tokens,
             CAST(len(regexp_extract_all(text,
                  '{BPE_TOKEN_PATTERN.replace("'", "''")}', 1)) AS BIGINT)
               AS n_bpe_tokens,
             CAST(length(text) AS BIGINT) AS n_chars
      FROM documents
    )
    SELECT doc_id, n_ws_tokens, n_bpe_tokens,
           CASE WHEN n_bpe_tokens = 0 THEN 0.0
                ELSE CAST(n_chars AS DOUBLE) / n_bpe_tokens END
             AS chars_per_token
    FROM t
    """,
    doc="Token counting, BPE-ish: a GPT-style pre-tokenizer regex "
        "(contractions / letter runs / digit runs / punctuation runs, "
        "restricted to the lookahead-free subset so Java regex and "
        "RE2 agree) next to the whitespace count, plus chars-per-"
        "token — the budget estimator every training-data pipeline "
        "runs before tokenizing 100 TB for real. Pure map stage, "
        "integer-exact counts")
def bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ws = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint")
    bpe = F.size(F.regexp_extract_all(
        F.col("text"), F.lit(BPE_TOKEN_PATTERN), F.lit(1))).cast("bigint")
    df = docs.select("doc_id", ws.alias("n_ws_tokens"),
                     bpe.alias("n_bpe_tokens"),
                     F.length("text").cast("bigint").alias("n_chars"))
    cpt = F.when(F.col("n_bpe_tokens") == 0, F.lit(0.0)).otherwise(
        F.col("n_chars").cast("double") / F.col("n_bpe_tokens"))
    return df.select("doc_id", "n_ws_tokens", "n_bpe_tokens",
                     cpt.alias("chars_per_token"))


# tx11 sequence packing: chunk size in chars (fixtures average ~300
# chars/doc, so 1-3 chunks per doc), token budget per training bin,
# and the deterministic Knuth-multiplicative val-split (5% ≈
# 214748365/2^32). Packing runs in deterministic SHUFFLE order — a
# second multiplicative hash permutes documents (chunks of a doc stay
# contiguous), exactly how a training pipeline shuffles before
# packing; a distinct multiplier keeps the shuffle order independent
# of the split decision. All-integer arithmetic so both engines agree
# bit-for-bit; doc_id*mult stays in int64 up to ~3.5e9 docs.
CHUNK_CHARS = 200
BIN_TOKENS = 512
VAL_HASH_MULT = 2654435761
VAL_HASH_MOD = 4294967296
VAL_THRESHOLD = 214748365   # floor(0.05 * 2^32)
SHUFFLE_MULT = 2246822519   # xxhash prime2 — independent permutation

# doc_id * mult must stay inside int64: Spark (ANSI off) would WRAP
# silently past this bound while DuckDB raises, so the two engines
# would diverge instead of failing. The builder therefore raises
# loudly past the bound (tests/test_text_formats.py pins it). At
# ~3.4e9 docs, re-key (e.g. pmod the id into 32 bits with a second
# disambiguating hash) before the multiplicative shuffle.
MAX_SAFE_DOC_ID = (2**63 - 1) // max(VAL_HASH_MULT, SHUFFLE_MULT)


@register(
    "tx11_chunk_pack_split",
    f"""
    WITH c AS (
      SELECT doc_id, CAST(u.x AS BIGINT) AS chunk_idx,
             CAST(u.x * {CHUNK_CHARS} + 1 AS BIGINT) AS chunk_start,
             substr(text, CAST(u.x * {CHUNK_CHARS} + 1 AS INT),
                    {CHUNK_CHARS}) AS chunk_text
      FROM (SELECT doc_id, text,
                   unnest(range(0,
                     CAST(greatest(ceil(length(text) / {CHUNK_CHARS}.0),
                                   1) AS BIGINT))) AS x
            FROM documents) u(doc_id, text, x)
    ), t AS (
      SELECT doc_id, chunk_idx, chunk_start,
             CAST(length(chunk_text) AS BIGINT) AS chunk_len,
             CAST(len(regexp_extract_all(chunk_text,
                  '{BPE_TOKEN_PATTERN.replace("'", "''")}', 1)) AS BIGINT)
               AS n_tokens
      FROM c
    ), h AS (
      SELECT *, (doc_id * {SHUFFLE_MULT}) % {VAL_HASH_MOD} AS shuffle_key
      FROM t
    ), s AS (
      SELECT *, sum(n_tokens) OVER (ORDER BY shuffle_key, doc_id,
                                             chunk_idx
                                    ROWS UNBOUNDED PRECEDING)
                  AS cum_tokens
      FROM h
    )
    SELECT doc_id, chunk_idx, chunk_start, chunk_len, n_tokens,
           CAST(shuffle_key AS BIGINT) AS shuffle_key,
           CAST(cum_tokens AS BIGINT) AS cum_tokens,
           CAST(floor((cum_tokens - n_tokens) / {BIN_TOKENS}.0) AS BIGINT)
             AS bin_id,
           (doc_id * {VAL_HASH_MULT}) % {VAL_HASH_MOD} < {VAL_THRESHOLD}
             AS is_val
    FROM s
    """,
    doc="Sequence packing + train/val split (beyond the reference, "
        "LLM-pipeline extension): context-window chunking (fixed "
        "char windows, 1→N explode per doc), per-chunk BPE-ish token "
        "counts (same lookahead-free pre-tokenizer as tx10), a "
        "deterministic multiplicative-hash document shuffle (chunks "
        "of a doc stay contiguous — the pack-after-shuffle order "
        "every training pipeline uses), greedy token-budget bin "
        "packing — bin = the bin where the chunk's token span starts "
        "in shuffle order, via an exact global token cumsum — and a "
        "deterministic Knuth-multiplicative-hash 5% validation split "
        "keyed on doc_id (independent multiplier from the shuffle) "
        "so every chunk of a doc lands on the same side (no "
        "train/val leakage). The cumsum is the scale-out bucketed "
        "prefix-sum (operators/prefix_sum.py bucketed_running_sum) "
        "over high-order shuffle-key buckets: per-bucket window + "
        "broadcast offsets, no global-order window task at 100 TB")
def chunk_pack_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pack_documents(load_table(spark, sf_dir, "documents"))


def _overflow_guarded(col) -> "F.Column":
    """Overflow guard (see MAX_SAFE_DOC_ID): fail loudly where ANSI-off
    Spark would otherwise wrap int64 and silently diverge from any
    engine that raises."""
    return (F.when(col > MAX_SAFE_DOC_ID, F.raise_error(F.concat(
        F.lit("tx11: id exceeds multiplicative-hash overflow "
              f"bound {MAX_SAFE_DOC_ID}: "), col.cast("string"))))
        .otherwise(col))


def pack_documents(docs: DataFrame, id_col: str = "doc_id",
                   split_col: str | None = None) -> DataFrame:
    """The tx11 packing operator over an arbitrary documents frame —
    chunk → count tokens → deterministic shuffle → token-budget bin
    packing → train/val split (semantics documented on the registered
    query above).

    ``id_col`` names the training-example identity column: the
    multiplicative shuffle keys on it, so chunks of one example stay
    contiguous. The e2e training pipeline passes a copy-aware
    surrogate id here so each mixture-upsampled copy packs as an
    independent example.

    ``split_col`` (default: the example id) names the column the
    train/val split keys on. When examples are upsampled COPIES of a
    document, the split must key on the ORIGINAL doc id, not the
    surrogate — otherwise two copies of the same text can land on
    opposite sides of the split and the val set leaks training data.
    """
    from ..operators.prefix_sum import bucketed_running_sum

    if id_col != "doc_id":
        # the surrogate id takes over the doc_id slot (the output
        # column names stay tx11-stable); any original doc_id column
        # is superseded by it (preserve it via split_col if needed)
        if split_col == "doc_id":
            docs = docs.withColumn("_split_id", F.col("doc_id"))
            split_col = "_split_id"
        if "doc_id" in docs.columns:
            docs = docs.drop("doc_id")
        docs = docs.withColumnRenamed(id_col, "doc_id")
    docs = docs.withColumn("doc_id", _overflow_guarded(F.col("doc_id")))
    docs = docs.withColumn(
        "_split_id",
        _overflow_guarded(F.col(split_col)) if split_col
        else F.col("doc_id"))
    n_chunks = F.greatest(
        F.ceil(F.length("text") / F.lit(float(CHUNK_CHARS))),
        F.lit(1)).cast("int")
    chunks = docs.select(
        "doc_id", "text", "_split_id",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"))
    chunk_text = F.expr(
        f"substring(text, CAST(chunk_idx * {CHUNK_CHARS} + 1 AS INT), "
        f"{CHUNK_CHARS})")
    t = chunks.select(
        "doc_id", "_split_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        (F.col("chunk_idx").cast("bigint") * CHUNK_CHARS + 1)
        .alias("chunk_start"),
        F.length(chunk_text).cast("bigint").alias("chunk_len"),
        F.size(F.regexp_extract_all(chunk_text,
                                    F.lit(BPE_TOKEN_PATTERN), F.lit(1)))
         .cast("bigint").alias("n_tokens"),
        ((F.col("doc_id") * SHUFFLE_MULT) % VAL_HASH_MOD)
        .alias("shuffle_key"))
    # bucket = high-order bits of the shuffle key: monotone in the
    # (shuffle_key, doc_id, chunk_idx) pack order, ~64 buckets.
    s = bucketed_running_sum(
        t, F.floor(F.col("shuffle_key") / (VAL_HASH_MOD // 64)),
        "n_tokens", ["shuffle_key", "doc_id", "chunk_idx"],
        out="cum_tokens")
    return s.select(
        "doc_id", "chunk_idx", "chunk_start", "chunk_len", "n_tokens",
        "shuffle_key", "cum_tokens",
        F.floor((F.col("cum_tokens") - F.col("n_tokens"))
                / F.lit(float(BIN_TOKENS))).cast("bigint").alias("bin_id"),
        ((F.col("_split_id") * VAL_HASH_MULT) % VAL_HASH_MOD
         < VAL_THRESHOLD).alias("is_val"))
