"""Text analysis operators for training-data pipelines: language id,
quality scoring, token counting, document fingerprinting.

All pure column expressions over the token grain — whole-stage codegen,
no UDFs — with DuckDB oracles generated from the same constants.

- language id: marker-lexicon voting (n-gram-heuristic stand-in; the
  container has no langid model, and the rule must be replayable by the
  SQL oracle). Deterministic arg-max with fixed priority order.
- quality score: length/stopword/diversity components, the shape of
  C4/Gopher-style quality filters, with reference NA semantics.
- token stats: whitespace tokens + a BPE-ish subword estimate
  (ceil(chars/4) per word, the common '~4 chars per token' rule).
- fingerprint: positional polynomial hash over dense token ids, an
  order-*sensitive* exact signature (reordered tokens change it) that is
  still order-independently aggregable (sum mod P over position terms).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tscan_spark import corpus
from tscan_spark.annotate import STOP_LEMMATA

FP_P = 2147483647  # fingerprint modulus (2^31 - 1)
FP_MIX = 2654435761  # Knuth multiplicative constant

LANG_MARKERS = {
    "en": ["the", "a", "fast", "small"],
    "es": ["data", "table", "sort"],
    "zh": ["hash", "join", "merge"],
}
LANG_PRIORITY = ["en", "es", "zh"]  # deterministic tie-break order


def _tok(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus.tokens_long(corpus.load(spark, sf_dir, "documents"))


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-voting language id with per-language scores."""
    tok = _tok(spark, sf_dir)
    aggs = [
        F.sum(F.col("word").isin(LANG_MARKERS[lang]).cast("int")).alias(f"score_{lang}")
        for lang in LANG_PRIORITY
    ]
    doc = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tok"), *aggs)
    # arg-max with forward priority on ties (same CASE order as the SQL)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in LANG_PRIORITY])
    label = F.lit(None).cast("string")
    for lang in reversed(LANG_PRIORITY):
        label = F.when(F.col(f"score_{lang}") == best, lang).otherwise(label)
    return doc.select(
        "doc_id",
        F.col("n_tok").cast("long").alias("n_tok"),
        *[F.col(f"score_{lang}").cast("long").alias(f"score_{lang}") for lang in LANG_PRIORITY],
        label.alias("pred_lang"),
    )


def sql_lang_id() -> str:
    score_cols = ",\n           ".join(
        "SUM(CASE WHEN word IN ({}) THEN 1 ELSE 0 END) AS score_{}".format(
            ", ".join(f"'{w}'" for w in LANG_MARKERS[lang]), lang
        )
        for lang in LANG_PRIORITY
    )
    greatest = "GREATEST({})".format(
        ", ".join(f"score_{lang}" for lang in LANG_PRIORITY)
    )
    case = " ".join(
        f"WHEN score_{lang} = {greatest} THEN '{lang}'" for lang in LANG_PRIORITY
    )
    return (
        "WITH "
        + corpus.SQL_TOK_CTE.strip()
        + f""",
d AS (
    SELECT doc_id, COUNT(*) AS n_tok,
           {score_cols}
    FROM tok GROUP BY doc_id
)
SELECT doc_id,
       CAST(n_tok AS BIGINT) AS n_tok,
       {", ".join(f"CAST(score_{lang} AS BIGINT) AS score_{lang}" for lang in LANG_PRIORITY)},
       CASE {case} END AS pred_lang
FROM d"""
    )


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style quality components + a weighted score.

    Components: mean word length, stop-word ratio, type-token ratio,
    length band. Score = 0.25*len_ok + 0.25*wlen_ok + 0.25*(1-stop_ratio)
    + 0.25*ttr, rounded 6dp; NULL-safe on empty docs.
    """
    tok = _tok(spark, sf_dir)
    stop_lits = STOP_LEMMATA
    doc = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tok"),
        F.sum(F.length("word")).alias("n_chars"),
        F.sum(F.col("word").isin(stop_lits).cast("int")).alias("n_stop"),
        F.countDistinct("word").alias("n_uniq"),
    )
    avg_wlen = F.col("n_chars") / F.col("n_tok")
    stop_ratio = F.col("n_stop") / F.col("n_tok")
    ttr = F.col("n_uniq") / F.col("n_tok")
    len_ok = ((F.col("n_tok") >= 20) & (F.col("n_tok") <= 200)).cast("int")
    wlen_ok = ((avg_wlen >= 3.0) & (avg_wlen <= 10.0)).cast("int")
    score = 0.25 * len_ok + 0.25 * wlen_ok + 0.25 * (1.0 - stop_ratio) + 0.25 * ttr
    return doc.select(
        "doc_id",
        F.col("n_tok").cast("long").alias("n_tok"),
        F.round(avg_wlen, 6).alias("avg_word_len"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(ttr, 6).alias("ttr"),
        F.round(score, 6).alias("quality"),
    )


def sql_quality_score() -> str:
    stop_lits = ", ".join(f"'{w}'" for w in STOP_LEMMATA)
    return (
        "WITH "
        + corpus.SQL_TOK_CTE.strip()
        + f""",
d AS (
    SELECT doc_id,
           COUNT(*) AS n_tok,
           SUM(length(word)) AS n_chars,
           SUM(CASE WHEN word IN ({stop_lits}) THEN 1 ELSE 0 END) AS n_stop,
           COUNT(DISTINCT word) AS n_uniq
    FROM tok GROUP BY doc_id
)
SELECT doc_id,
       CAST(n_tok AS BIGINT) AS n_tok,
       ROUND(n_chars * 1.0 / n_tok, 6) AS avg_word_len,
       ROUND(n_stop * 1.0 / n_tok, 6) AS stop_ratio,
       ROUND(n_uniq * 1.0 / n_tok, 6) AS ttr,
       ROUND(0.25 * (CASE WHEN n_tok >= 20 AND n_tok <= 200 THEN 1 ELSE 0 END)
             + 0.25 * (CASE WHEN n_chars * 1.0 / n_tok >= 3.0
                             AND n_chars * 1.0 / n_tok <= 10.0 THEN 1 ELSE 0 END)
             + 0.25 * (1.0 - n_stop * 1.0 / n_tok)
             + 0.25 * (n_uniq * 1.0 / n_tok), 6) AS quality
FROM d"""
    )


def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token count + BPE-ish subword estimate per document."""
    tok = _tok(spark, sf_dir)
    subwords = F.ceil(F.length("word") / 4.0)
    return tok.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_ws_tokens"),
        F.sum(subwords).cast("long").alias("n_subword_est"),
        F.max(F.length("word")).cast("int").alias("max_word_len"),
        F.countDistinct("word").cast("long").alias("n_uniq_words"),
    )


SQL_TOKEN_STATS = """
SELECT doc_id, source,
       COUNT(*) AS n_ws_tokens,
       CAST(SUM(CAST(ceil(length(word) / 4.0) AS BIGINT)) AS BIGINT) AS n_subword_est,
       CAST(MAX(length(word)) AS INT) AS max_word_len,
       COUNT(DISTINCT word) AS n_uniq_words
FROM tok
GROUP BY doc_id, source"""


def fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive positional document fingerprint.

    fp = SUM over positions of ((token_id + 1) * ((pos + 1) * MIX mod P))
    mod P — exact int64 arithmetic, replayable anywhere, and any token
    reorder/edit changes it (used for fast exact-sequence identity at
    corpus scale; cheaper than comparing token arrays).

    token_id is the per-row content hash (corpus.content_hash_expr) —
    the whole plan is one narrow codegen scan + one doc_id hash-agg; no
    vocabulary table, no broadcast, no global rank window.
    """
    d = corpus.load(spark, sf_dir, "documents")
    tok = corpus.tokens_long(d)
    t = tok.withColumn("token_id", corpus.content_hash_expr("word"))
    term = (
        (F.col("token_id") + 1)
        * ((F.col("word_idx").cast("long") + 1) * FP_MIX % FP_P)
        % FP_P
    )
    return t.groupBy("doc_id").agg(
        (F.sum(term) % FP_P).cast("long").alias("fingerprint"),
        F.count(F.lit(1)).cast("long").alias("n_tok"),
    )


def sql_fingerprint() -> str:
    return (
        "WITH "
        + corpus.SQL_TOK_CTE.strip()
        + f""",
tokid AS (
    SELECT tok.*, {corpus.sql_content_hash("word")} AS token_id FROM tok
)
SELECT doc_id,
       CAST(SUM((token_id + 1) * ((CAST(word_idx AS BIGINT) + 1) * {FP_MIX} % {FP_P})
                % {FP_P}) % {FP_P} AS BIGINT) AS fingerprint,
       COUNT(*) AS n_tok
FROM tokid
GROUP BY doc_id"""
    )


# ---------------------------------------------------------------------------
# Stratified sampling (training-data curation)
# ---------------------------------------------------------------------------
#
# Curation pipelines rarely train on the raw crawl: they keep all the
# high-quality documents and down-sample the low-quality tail at fixed
# per-stratum rates, carrying an inverse-probability weight so any
# statistic over the sample stays unbiased. The keep decision must be a
# pure function of the document (NOT rand()) so re-runs, retries and
# both engines agree row-for-row: keep iff
# content_hash(doc_id || SAMPLE_SALT) % 1000 < rate_per_mille(stratum).
#
# Strata here = quality band (thresholds on the rounded quality score,
# so both engines band identical values). One token pass computes the
# language scores and the quality components in a single hash
# aggregate; the filter is doc-grain. At 100 TB this is one scan + one
# doc-keyed combine — no shuffle beyond the aggregate, no rand(), no
# driver-side state.

SAMPLE_RATES = {"hi": 1000, "mid": 500, "lo": 125}  # per-mille keep rates
Q_HI = 0.60  # quality >= Q_HI        -> 'hi'
Q_MID = 0.45  # Q_MID <= quality < Q_HI -> 'mid', else 'lo'
SAMPLE_SALT = ":samp"


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-gated stratified sample of the corpus.

    Output (kept docs only): doc_id, pred_lang, q_band, quality,
    samp_hash, weight — weight = 1000/rate is the inverse-probability
    reweighting factor downstream estimators multiply in.
    """
    tok = _tok(spark, sf_dir)
    lang_aggs = [
        F.sum(F.col("word").isin(LANG_MARKERS[lang]).cast("int")).alias(f"score_{lang}")
        for lang in LANG_PRIORITY
    ]
    doc = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tok"),
        F.sum(F.length("word")).alias("n_chars"),
        F.sum(F.col("word").isin(STOP_LEMMATA).cast("int")).alias("n_stop"),
        F.countDistinct("word").alias("n_uniq"),
        *lang_aggs,
    )
    avg_wlen = F.col("n_chars") / F.col("n_tok")
    len_ok = ((F.col("n_tok") >= 20) & (F.col("n_tok") <= 200)).cast("int")
    wlen_ok = ((avg_wlen >= 3.0) & (avg_wlen <= 10.0)).cast("int")
    quality = F.round(
        0.25 * len_ok
        + 0.25 * wlen_ok
        + 0.25 * (1.0 - F.col("n_stop") / F.col("n_tok"))
        + 0.25 * (F.col("n_uniq") / F.col("n_tok")),
        6,
    )
    best = F.greatest(*[F.col(f"score_{lang}") for lang in LANG_PRIORITY])
    label = F.lit(None).cast("string")
    for lang in reversed(LANG_PRIORITY):
        label = F.when(F.col(f"score_{lang}") == best, lang).otherwise(label)
    d = doc.select("doc_id", quality.alias("quality"), label.alias("pred_lang"))
    q_band = (
        F.when(F.col("quality") >= Q_HI, "hi")
        .when(F.col("quality") >= Q_MID, "mid")
        .otherwise("lo")
    )
    rate = (
        F.when(F.col("q_band") == "hi", SAMPLE_RATES["hi"])
        .when(F.col("q_band") == "mid", SAMPLE_RATES["mid"])
        .otherwise(SAMPLE_RATES["lo"])
    )
    samp_hash = corpus.content_hash_expr(
        F.concat(F.col("doc_id").cast("string"), F.lit(SAMPLE_SALT))
    )
    r = (
        d.withColumn("q_band", q_band)
        .withColumn("rate", rate.cast("long"))
        .withColumn("samp_hash", samp_hash.cast("long"))
    )
    return r.where(F.col("samp_hash") % 1000 < F.col("rate")).select(
        "doc_id",
        "pred_lang",
        "q_band",
        "quality",
        "samp_hash",
        F.round(1000.0 / F.col("rate"), 6).alias("weight"),
    )


def sql_sample_stratified() -> str:
    stop_lits = ", ".join(f"'{w}'" for w in STOP_LEMMATA)
    score_cols = ",\n           ".join(
        "SUM(CASE WHEN word IN ({}) THEN 1 ELSE 0 END) AS score_{}".format(
            ", ".join(f"'{w}'" for w in LANG_MARKERS[lang]), lang
        )
        for lang in LANG_PRIORITY
    )
    greatest = "GREATEST({})".format(
        ", ".join(f"score_{lang}" for lang in LANG_PRIORITY)
    )
    case = " ".join(
        f"WHEN score_{lang} = {greatest} THEN '{lang}'" for lang in LANG_PRIORITY
    )
    samp_hash = corpus.sql_content_hash(
        f"(CAST(doc_id AS VARCHAR) || '{SAMPLE_SALT}')"
    )
    return (
        "WITH "
        + corpus.SQL_TOK_CTE.strip()
        + f""",
d AS (
    SELECT doc_id,
           COUNT(*) AS n_tok,
           SUM(length(word)) AS n_chars,
           SUM(CASE WHEN word IN ({stop_lits}) THEN 1 ELSE 0 END) AS n_stop,
           COUNT(DISTINCT word) AS n_uniq,
           {score_cols}
    FROM tok GROUP BY doc_id
),
s AS (
    SELECT doc_id,
           ROUND(0.25 * (CASE WHEN n_tok >= 20 AND n_tok <= 200 THEN 1 ELSE 0 END)
                 + 0.25 * (CASE WHEN n_chars * 1.0 / n_tok >= 3.0
                                 AND n_chars * 1.0 / n_tok <= 10.0 THEN 1 ELSE 0 END)
                 + 0.25 * (1.0 - n_stop * 1.0 / n_tok)
                 + 0.25 * (n_uniq * 1.0 / n_tok), 6) AS quality,
           CASE {case} END AS pred_lang
    FROM d
),
b AS (
    SELECT *,
           CASE WHEN quality >= {Q_HI} THEN 'hi'
                WHEN quality >= {Q_MID} THEN 'mid'
                ELSE 'lo' END AS q_band
    FROM s
),
r AS (
    SELECT *,
           CASE q_band WHEN 'hi' THEN {SAMPLE_RATES['hi']}
                       WHEN 'mid' THEN {SAMPLE_RATES['mid']}
                       ELSE {SAMPLE_RATES['lo']} END AS rate,
           {samp_hash} AS samp_hash
    FROM b
)
SELECT doc_id, pred_lang, q_band, quality,
       CAST(samp_hash AS BIGINT) AS samp_hash,
       ROUND(1000.0 / rate, 6) AS weight
FROM r
WHERE samp_hash % 1000 < rate"""
    )


# ---------------------------------------------------------------------------
# PII detection / redaction
# ---------------------------------------------------------------------------
#
# A standard pre-training curation pass: detect emails / phone numbers /
# IPv4 addresses and redact them to typed placeholders.  The synthetic
# corpus contains no digits, so the operator synthesizes a deterministic
# PII-bearing ``contact`` column from doc_id (the documented
# synthetic-input convention, same as the surprisal and multimodal
# sources) and runs REAL regex mechanics over it: detection via
# regexp_count, redaction via chained regexp_replace — all JVM-side
# expressions inside whole-stage codegen, no UDFs.  The patterns stay in
# the common Java-regex / RE2 subset so the DuckDB oracle replays them.

PII_EMAIL = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
PII_PHONE = "[0-9]{2}-[0-9]{8}"
PII_IPV4 = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"


def _contact_expr():
    """Deterministic PII-bearing string derived from doc_id."""
    d = F.col("doc_id")
    email = F.when(
        d % 7 == 0,
        F.concat(
            F.lit(" user"),
            d.cast("string"),
            F.lit("@mail"),
            (d % 10).cast("string"),
            F.lit(".com"),
        ),
    ).otherwise(F.lit(""))
    phone = F.when(
        d % 11 == 0,
        F.concat(F.lit(" 06-"), F.lpad((d % 100000000).cast("string"), 8, "0")),
    ).otherwise(F.lit(""))
    ip = F.when(
        d % 13 == 0,
        F.concat(
            F.lit(" 10."),
            (d % 256).cast("string"),
            F.lit("."),
            (F.floor(d / 256) % 256).cast("string"),
            F.lit("."),
            (d % 250 + 1).cast("string"),
        ),
    ).otherwise(F.lit(""))
    return F.concat(F.lit("note "), d.cast("string"), email, phone, ip)


def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc PII counts + redacted contact string.

    Output: doc_id, n_email, n_phone, n_ipv4, has_pii, redacted.
    """
    docs = corpus.load(spark, sf_dir, "documents").select(
        "doc_id", _contact_expr().alias("contact")
    )
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("contact"), F.lit(PII_EMAIL), F.lit("<EMAIL>")),
            F.lit(PII_PHONE),
            F.lit("<PHONE>"),
        ),
        F.lit(PII_IPV4),
        F.lit("<IP>"),
    )
    n_email = F.regexp_count(F.col("contact"), F.lit(PII_EMAIL))
    n_phone = F.regexp_count(F.col("contact"), F.lit(PII_PHONE))
    n_ipv4 = F.regexp_count(F.col("contact"), F.lit(PII_IPV4))
    return docs.select(
        "doc_id",
        n_email.cast("int").alias("n_email"),
        n_phone.cast("int").alias("n_phone"),
        n_ipv4.cast("int").alias("n_ipv4"),
        ((n_email + n_phone + n_ipv4) > 0).alias("has_pii"),
        red.alias("redacted"),
    )


def sql_pii_redact() -> str:
    email, phone, ip = PII_EMAIL, PII_PHONE, PII_IPV4
    return f"""
WITH base AS (
    SELECT doc_id,
           'note ' || CAST(doc_id AS VARCHAR)
           || CASE WHEN doc_id % 7 = 0
                   THEN ' user' || CAST(doc_id AS VARCHAR) || '@mail'
                        || CAST(doc_id % 10 AS VARCHAR) || '.com'
                   ELSE '' END
           || CASE WHEN doc_id % 11 = 0
                   THEN ' 06-' || lpad(CAST(doc_id % 100000000 AS VARCHAR), 8, '0')
                   ELSE '' END
           || CASE WHEN doc_id % 13 = 0
                   THEN ' 10.' || CAST(doc_id % 256 AS VARCHAR) || '.'
                        || CAST((doc_id // 256) % 256 AS VARCHAR) || '.'
                        || CAST(doc_id % 250 + 1 AS VARCHAR)
                   ELSE '' END AS contact
    FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(contact, '{email}')) AS INT) AS n_email,
       CAST(len(regexp_extract_all(contact, '{phone}')) AS INT) AS n_phone,
       CAST(len(regexp_extract_all(contact, '{ip}')) AS INT) AS n_ipv4,
       (len(regexp_extract_all(contact, '{email}'))
        + len(regexp_extract_all(contact, '{phone}'))
        + len(regexp_extract_all(contact, '{ip}'))) > 0 AS has_pii,
       regexp_replace(
           regexp_replace(
               regexp_replace(contact, '{email}', '<EMAIL>', 'g'),
               '{phone}', '<PHONE>', 'g'),
           '{ip}', '<IP>', 'g') AS redacted
FROM base"""


# ---------------------------------------------------------------------------
# Zipf-law fit per source (corpus-health diagnostic)
# ---------------------------------------------------------------------------


def zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Zipf exponent via OLS on log-rank/log-frequency.

    A standard corpus-health diagnostic for web-scale pipelines: natural
    text follows freq ~ rank^(-s) with s near 1; machine-generated or
    template-heavy sources flatten (|slope| small) or over-steepen.  The
    reference's frequency machinery is lexicon-relative only
    (freqLog bands, tscan.cxx:462-471); this measures the corpus's OWN
    frequency law per source.

    Plan shape: one (source, word) hash aggregate over the token grain,
    then a window partitioned BY SOURCE for ranks (each partition is a
    source's vocabulary — bounded by vocab size, not corpus size), then
    ``regr_slope``/``regr_r2`` built-ins (map-side-combinable moment
    aggregates).  No corpus-grain shuffle beyond the first aggregate;
    no persist needed (single linear pipeline).

    Ties in cnt are broken by word ASC so rank assignment is
    integer-deterministic across engines; the regression consumes
    identical (x, y) sets either way.  Slope/r2 rounded to 7 dp —
    moment sums accumulate in different orders on the two engines.
    """
    from pyspark.sql.window import Window

    tok = _tok(spark, sf_dir).select("source", "word")
    cnt = tok.groupBy("source", "word").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("source").orderBy(F.desc("cnt"), F.asc("word"))
    ranked = cnt.withColumn("rank", F.row_number().over(w))
    return (
        ranked.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_vocab"),
            F.round(
                F.regr_slope(F.log(F.col("cnt").cast("double")),
                             F.log(F.col("rank").cast("double"))), 7
            ).alias("zipf_slope"),
            F.round(
                F.regr_r2(F.log(F.col("cnt").cast("double")),
                          F.log(F.col("rank").cast("double"))), 7
            ).alias("zipf_r2"),
        )
        .orderBy("source")
    )


SQL_ZIPF_FIT = """
WITH {tok_cte},
cnt AS (SELECT source, word, COUNT(*) AS cnt FROM tok GROUP BY 1, 2),
ranked AS (
    SELECT source, cnt,
           ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY cnt DESC, word ASC) AS rank
    FROM cnt
)
SELECT source,
       CAST(COUNT(*) AS INT) AS n_vocab,
       ROUND(regr_slope(ln(CAST(cnt AS DOUBLE)), ln(CAST(rank AS DOUBLE))), 7)
           AS zipf_slope,
       ROUND(regr_r2(ln(CAST(cnt AS DOUBLE)), ln(CAST(rank AS DOUBLE))), 7)
           AS zipf_r2
FROM ranked
GROUP BY source
ORDER BY source
"""
SQL_ZIPF_FIT = SQL_ZIPF_FIT.format(tok_cte=corpus.SQL_TOK_CTE)


# ---------------------------------------------------------------------------
# Per-source distributional profiling: length percentiles + unigram entropy
# ---------------------------------------------------------------------------


def source_length_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document-length distribution (exact percentiles).

    Length-distribution drift between sources is the first thing a
    crawl-curation run inspects (truncated shards, boilerplate bursts).
    Plan: token grain -> one doc-grain count -> one source-grain
    aggregate.  ``percentile`` is the EXACT interpolated aggregate
    (identical linear interpolation to DuckDB's quantile_cont,
    verified); it holds per-group value counts, bounded here by the
    distinct-length domain (small ints), not corpus cardinality — at
    100 TB with unbounded value domains swap ``percentile_approx``,
    same plan.  Percentiles rounded to 6 dp (interpolation arithmetic
    differs in the last ULP across engines).
    """
    tok = _tok(spark, sf_dir).select("doc_id", "source")
    dl = tok.groupBy("source", "doc_id").agg(F.count(F.lit(1)).alias("n_tok"))
    pct = F.percentile(
        F.col("n_tok").cast("double"),
        F.lit([0.25, 0.5, 0.75, 0.95]).cast("array<double>"),
    )
    return (
        dl.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_docs"),
            F.round(F.avg("n_tok"), 6).alias("mean_len"),
            F.min("n_tok").cast("int").alias("min_len"),
            F.round(pct[0], 6).alias("p25"),
            F.round(pct[1], 6).alias("p50"),
            F.round(pct[2], 6).alias("p75"),
            F.round(pct[3], 6).alias("p95"),
            F.max("n_tok").cast("int").alias("max_len"),
        )
        .orderBy("source")
    )


SQL_SOURCE_LENGTH_STATS = """
WITH {tok_cte},
dl AS (SELECT source, doc_id, COUNT(*) AS n_tok FROM tok GROUP BY 1, 2)
SELECT source,
       CAST(COUNT(*) AS INT) AS n_docs,
       ROUND(AVG(n_tok), 6) AS mean_len,
       CAST(MIN(n_tok) AS INT) AS min_len,
       ROUND(quantile_cont(CAST(n_tok AS DOUBLE), 0.25), 6) AS p25,
       ROUND(quantile_cont(CAST(n_tok AS DOUBLE), 0.5), 6) AS p50,
       ROUND(quantile_cont(CAST(n_tok AS DOUBLE), 0.75), 6) AS p75,
       ROUND(quantile_cont(CAST(n_tok AS DOUBLE), 0.95), 6) AS p95,
       CAST(MAX(n_tok) AS INT) AS max_len
FROM dl
GROUP BY source
ORDER BY source
"""
SQL_SOURCE_LENGTH_STATS = SQL_SOURCE_LENGTH_STATS.format(tok_cte=corpus.SQL_TOK_CTE)


def unigram_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Shannon entropy of the unigram distribution.

    Low entropy flags template/boilerplate-dominated sources; the
    normalized form (H / ln|V|) is comparable across sources with
    different vocabulary sizes.  Plan: the same (source, word) hash
    aggregate as :func:`zipf_fit`, then a source-grain reduction —
    -sum(p ln p) decomposes as ln(tot) - sum(cnt ln cnt)/tot, so the
    per-word pass needs no second join against totals.
    """
    tok = _tok(spark, sf_dir).select("source", "word")
    cnt = tok.groupBy("source", "word").agg(F.count(F.lit(1)).alias("cnt"))
    agg = cnt.groupBy("source").agg(
        F.sum("cnt").alias("tot"),
        F.count(F.lit(1)).alias("n_vocab"),
        F.sum(F.col("cnt").cast("double") * F.log(F.col("cnt").cast("double"))).alias(
            "s"
        ),
    )
    h = F.log(F.col("tot").cast("double")) - F.col("s") / F.col("tot")
    return agg.select(
        "source",
        F.col("tot").cast("int").alias("n_tokens"),
        F.col("n_vocab").cast("int").alias("n_vocab"),
        F.round(h, 7).alias("entropy"),
        F.round(h / F.log(F.col("n_vocab").cast("double")), 7).alias("norm_entropy"),
    ).orderBy("source")


SQL_UNIGRAM_ENTROPY = """
WITH {tok_cte},
cnt AS (SELECT source, word, COUNT(*) AS cnt FROM tok GROUP BY 1, 2),
agg AS (
    SELECT source, SUM(cnt) AS tot, COUNT(*) AS n_vocab,
           SUM(CAST(cnt AS DOUBLE) * ln(CAST(cnt AS DOUBLE))) AS s
    FROM cnt GROUP BY 1
)
SELECT source,
       CAST(tot AS INT) AS n_tokens,
       CAST(n_vocab AS INT) AS n_vocab,
       ROUND(ln(CAST(tot AS DOUBLE)) - s / tot, 7) AS entropy,
       ROUND((ln(CAST(tot AS DOUBLE)) - s / tot)
             / ln(CAST(n_vocab AS DOUBLE)), 7) AS norm_entropy
FROM agg
ORDER BY source
"""
SQL_UNIGRAM_ENTROPY = SQL_UNIGRAM_ENTROPY.format(tok_cte=corpus.SQL_TOK_CTE)


# ---------------------------------------------------------------------------
# per-source quality-quantile gate
# ---------------------------------------------------------------------------

QUALITY_GATE_Q = 0.25  # drop each source's bottom quartile


def quality_quantile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality floor at the QUALITY_GATE_Q quantile.

    `select_token_budget` cuts by rank; production corpus runs cut by a
    per-source QUANTILE of the quality score so the gate is a single
    scalar per source (broadcastable, stable to publish in run
    metadata).  This computes the exact interpolated quantile of the
    registered quality score per source and the resulting keep
    accounting.

    Plan: the quality_score doc-grain aggregate, one source-grain
    percentile (exact here — value domain is the 6dp-rounded score;
    percentile_approx at unbounded scale, same plan), one broadcast
    threshold join back, one funnel aggregate.
    """
    docs = corpus.load(spark, sf_dir, "documents").select("doc_id", "source")
    q = quality_score(spark, sf_dir).select("doc_id", "n_tok", "quality")
    scored = docs.join(q, "doc_id")
    thr = scored.groupBy("source").agg(
        F.round(
            F.percentile(F.col("quality"), F.lit(QUALITY_GATE_Q)), 6
        ).alias("q_floor")
    )
    gated = scored.join(F.broadcast(thr), "source").withColumn(
        "keep", F.col("quality") >= F.col("q_floor")
    )
    return (
        gated.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_docs"),
            F.any_value("q_floor").alias("q_floor"),
            F.sum(F.col("keep").cast("int")).cast("int").alias("n_keep"),
            F.sum(F.when(F.col("keep"), F.col("n_tok")).otherwise(F.lit(0)))
            .cast("long")
            .alias("tokens_keep"),
        )
        .orderBy("source")
    )


def sql_quality_quantile_gate() -> str:
    return f"""
WITH q AS (
    SELECT doc_id, n_tok, quality FROM ({sql_quality_score()})
),
scored AS (
    SELECT d.source, q.doc_id, q.n_tok, q.quality
    FROM documents d JOIN q ON d.doc_id = q.doc_id
),
thr AS (
    SELECT source,
           ROUND(quantile_cont(quality, {QUALITY_GATE_Q}), 6) AS q_floor
    FROM scored GROUP BY 1
)
SELECT s.source,
       CAST(COUNT(*) AS INT) AS n_docs,
       ANY_VALUE(t.q_floor) AS q_floor,
       CAST(SUM(CASE WHEN s.quality >= t.q_floor THEN 1 ELSE 0 END) AS INT)
           AS n_keep,
       CAST(SUM(CASE WHEN s.quality >= t.q_floor THEN s.n_tok ELSE 0 END)
            AS BIGINT) AS tokens_keep
FROM scored s JOIN thr t USING (source)
GROUP BY s.source
ORDER BY s.source"""


# ---------------------------------------------------------------------------
# label-quality audit: declared lang vs predicted lang
# ---------------------------------------------------------------------------


def lang_label_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion summary between the DECLARED ``lang`` column and the
    engine's ``lang_id`` prediction.

    Web-crawl metadata lies; auditing declared labels against an
    independent classifier is the first label-quality gate a training
    pipeline runs (mislabeled docs poison per-language mixes).  One
    row per (declared, predicted) pair with counts and the share of
    the declared label's docs — a disagreement row with a large share
    flags a systematically mislabeled slice.

    Plan: the lang_id doc-grain aggregate + a broadcast-joinable
    (doc_id, lang) projection + ONE (lang, pred_lang) aggregate;
    corpus touched once.
    """
    docs = corpus.load(spark, sf_dir, "documents").select("doc_id", "lang")
    pred = lang_id(spark, sf_dir).select("doc_id", "pred_lang")
    joined = docs.join(pred, "doc_id")
    per_lang = joined.groupBy("lang").agg(F.count(F.lit(1)).alias("n_lang"))
    return (
        joined.groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).cast("int").alias("n_docs"))
        .join(F.broadcast(per_lang), "lang")
        .select(
            "lang",
            "pred_lang",
            "n_docs",
            F.round(F.col("n_docs") / F.col("n_lang"), 6).alias("share"),
            (F.col("lang") == F.col("pred_lang")).alias("agree"),
        )
        .orderBy("lang", "pred_lang")
    )


def sql_lang_label_audit() -> str:
    return f"""
WITH pred AS (
    SELECT doc_id, pred_lang FROM ({sql_lang_id()})
),
joined AS (
    SELECT d.lang, p.pred_lang
    FROM documents d JOIN pred p ON d.doc_id = p.doc_id
),
per_lang AS (SELECT lang, COUNT(*) AS n_lang FROM joined GROUP BY 1)
SELECT j.lang, j.pred_lang,
       CAST(COUNT(*) AS INT) AS n_docs,
       ROUND(COUNT(*) * 1.0 / ANY_VALUE(p.n_lang), 6) AS share,
       j.lang = j.pred_lang AS agree
FROM joined j JOIN per_lang p USING (lang)
GROUP BY j.lang, j.pred_lang
ORDER BY j.lang, j.pred_lang"""
