"""Deduplication operators for large-scale training-data pipelines.

Not present in the reference (T-Scan analyses documents independently);
these are the corpus-preparation operators a 100 TB tokenized corpus
needs before feature extraction, built Spark-first:

- exact dedup        : md5(text) hash-groupBy (one shuffle on the hash,
                       perfectly parallel, no skew — hash keys uniform)
- n-gram Jaccard     : shingle inverted-index self-join (classic
                       candidate generation: pairs sharing a shingle),
                       exact Jaccard verify; at scale the shingle join
                       is the standard pruning structure (posting lists)
- MinHash + LSH      : shingle -> dense id -> k universal-hash minima ->
                       banded buckets -> candidate pairs -> exact verify.
                       All arithmetic ((a*sid+b) mod P) so the DuckDB
                       oracle replays it bit-for-bit (no engine-specific
                       hash functions anywhere).
- SimHash            : 16-bit signature over token-id multiplicative
                       hashes; near-dup pairs via 4x4-bit band buckets
                       (pigeonhole: hamming<=3 pairs share >=1 band),
                       verified by xor/bit_count hamming distance.

Determinism: every hash is explicit integer arithmetic; every float is
fixed-point; every tie is broken by (doc_id_a, doc_id_b) ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tscan_spark import corpus

SHINGLE_N = 3
JACCARD_THRESHOLD = 0.25
MINHASH_P = 2147483647  # 2^31 - 1 (Mersenne prime)
NUM_HASHES = 16
NUM_BANDS = 4  # 4 rows per band
SIMHASH_BITS = 16
SIMHASH_A = 40503
SIMHASH_B = 1299721
SIMHASH_MAX_HAMMING = 3


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus.load(spark, sf_dir, "documents")


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups: md5(text) -> (representative, dup count)."""
    d = _docs(spark, sf_dir)
    return (
        d.groupBy(F.md5("text").alias("text_hash"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("dup_cnt"),
        )
        .select("text_hash", "keep_doc_id", F.col("dup_cnt").cast("long").alias("dup_cnt"))
    )


SQL_EXACT_DEDUP = """
SELECT md5(text) AS text_hash,
       MIN(doc_id) AS keep_doc_id,
       COUNT(*) AS dup_cnt
FROM documents
GROUP BY md5(text)"""


# ---------------------------------------------------------------------------
# shingles (shared by Jaccard + MinHash)
# ---------------------------------------------------------------------------


def shingles(documents: DataFrame, n: int = SHINGLE_N) -> DataFrame:
    """Distinct word n-gram shingles per document: (doc_id, shingle)."""
    tok = corpus.tokens_long(documents)
    w = Window.partitionBy("doc_id").orderBy("word_idx")
    grams = [F.col("word")] + [F.lead("word", i).over(w) for i in range(1, n)]
    sh = tok.select(
        "doc_id",
        F.concat_ws(" ", *grams).alias("shingle"),
        grams[-1].alias("_last"),
    ).where(F.col("_last").isNotNull())
    return sh.select("doc_id", "shingle").distinct()


SQL_SHINGLES_CTE = """
sh AS (
    SELECT DISTINCT doc_id, word || ' ' || w1 || ' ' || w2 AS shingle
    FROM (
        SELECT doc_id, word,
               lead(word, 1) OVER (PARTITION BY doc_id ORDER BY word_idx) AS w1,
               lead(word, 2) OVER (PARTITION BY doc_id ORDER BY word_idx) AS w2
        FROM tok
    )
    WHERE w2 IS NOT NULL
)"""


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup pairs
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by exact shingle-set Jaccard.

    Candidate generation = inverted-index self-join on shingle (pairs
    with zero overlap never meet — the scalable pruning); exact Jaccard
    on the intersection counts.
    """
    d = _docs(spark, sf_dir)
    sh = shingles(d).persist()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, "shingle")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    j = (
        common.join(sizes.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("n_sh", "n_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b"), "doc_b")
        .withColumnRenamed("n_sh", "n_b")
    )
    jac = F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    return (
        j.select(
            "doc_a",
            "doc_b",
            F.col("n_common").cast("long").alias("n_common"),
            F.round(jac, 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


def sql_ngram_jaccard() -> str:
    return (
        "WITH "
        + corpus.SQL_TOK_CTE.strip()
        + ",\n"
        + SQL_SHINGLES_CTE.strip()
        + f""",
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
    FROM sh a JOIN sh b USING (shingle)
    WHERE a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       CAST(n_common AS BIGINT) AS n_common,
       ROUND(n_common / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= {JACCARD_THRESHOLD}"""
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _hash_params(spark: SparkSession) -> DataFrame:
    """k universal-hash parameter rows (a_j, b_j) — tiny broadcast dim."""
    rows = [(j, 1 + 7919 * j, 104729 * j + 12345) for j in range(NUM_HASHES)]
    return spark.createDataFrame(rows, "j int, a long, b long")


def minhash_signatures(
    spark: SparkSession, sf_dir: str, sh: DataFrame | None = None
) -> DataFrame:
    """(doc_id, j, minhash) via dense shingle ids + (a*sid+b) mod P."""
    if sh is None:
        sh = shingles(_docs(spark, sf_dir))
    sid = sh.select("shingle").distinct().select(
        "shingle",
        (F.dense_rank().over(Window.orderBy("shingle"))).cast("long").alias("sid"),
    )
    doc_sid = sh.join(F.broadcast(sid), "shingle").select("doc_id", "sid")
    hp = _hash_params(spark)
    return (
        doc_sid.crossJoin(F.broadcast(hp))
        .groupBy("doc_id", "j")
        .agg(F.min((F.col("a") * F.col("sid") + F.col("b")) % MINHASH_P).alias("mh"))
    )


def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate pairs -> exact Jaccard verification.

    Bands of NUM_HASHES/NUM_BANDS rows; candidates share an identical
    band signature; every candidate is verified with the exact shingle
    Jaccard, so output quality does not depend on the sketch.
    """
    # the shingle subtree feeds signatures, sizes and the verify join —
    # persist it once (bench/queries clear the cache afterwards)
    sh = shingles(_docs(spark, sf_dir)).persist()
    sigs = minhash_signatures(spark, sf_dir, sh=sh)
    rows_per_band = NUM_HASHES // NUM_BANDS
    banded = sigs.withColumn("band", (F.col("j") / rows_per_band).cast("int"))
    band_key = banded.groupBy("doc_id", "band").agg(
        F.concat_ws(",", F.sort_array(F.collect_list(F.concat_ws(":", "j", "mh")))).alias(
            "band_key"
        )
    )
    a, b = band_key.alias("a"), band_key.alias("b")
    cand = (
        a.join(b, ["band", "band_key"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    # exact verify via the same persisted shingle sets
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    # exact path: count common shingles per candidate pair
    common = (
        cand.join(sh.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .join(
            sh.withColumnRenamed("doc_id", "doc_b"),
            ["doc_b", "shingle"],
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    j = (
        common.join(sizes.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("n_sh", "n_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b"), "doc_b")
        .withColumnRenamed("n_sh", "n_b")
    )
    jac = F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    return j.select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))


def sql_minhash_lsh_pairs() -> str:
    rows_per_band = NUM_HASHES // NUM_BANDS
    return (
        "WITH "
        + corpus.SQL_TOK_CTE.strip()
        + ",\n"
        + SQL_SHINGLES_CTE.strip()
        + f""",
sid AS (
    SELECT shingle, CAST(DENSE_RANK() OVER (ORDER BY shingle) AS BIGINT) AS sid
    FROM (SELECT DISTINCT shingle FROM sh)
),
doc_sid AS (SELECT doc_id, sid FROM sh JOIN sid USING (shingle)),
hp AS (
    SELECT CAST(j AS INT) AS j, 1 + 7919 * j AS a, 104729 * j + 12345 AS b
    FROM range({NUM_HASHES}) t(j)
),
sigs AS (
    SELECT doc_id, j, MIN((a * sid + b) % {MINHASH_P}) AS mh
    FROM doc_sid CROSS JOIN hp
    GROUP BY doc_id, j
),
band_key AS (
    SELECT doc_id, CAST(j // {rows_per_band} AS INT) AS band,
           array_to_string(list(j || ':' || mh ORDER BY j || ':' || mh), ',')
               AS band_key
    FROM sigs
    GROUP BY doc_id, CAST(j // {rows_per_band} AS INT)
),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM band_key a JOIN band_key b USING (band, band_key)
    WHERE a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
    SELECT doc_a, doc_b, COUNT(*) AS n_common
    FROM cand
    JOIN sh a ON a.doc_id = doc_a
    JOIN sh b ON b.doc_id = doc_b AND b.shingle = a.shingle
    GROUP BY doc_a, doc_b
)
SELECT doc_a, doc_b,
       ROUND(n_common / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b"""
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash per document over token-id multiplicative hashes.

    Dense token ids come from the corpus vocab; bit b of a token's hash
    votes +count/-count; signature bit = majority (> 0).
    """
    d = _docs(spark, sf_dir)
    tok = corpus.tokens_long(d)
    v = corpus.vocab(d)
    t = tok.join(F.broadcast(v), "word").groupBy("doc_id", "token_id").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    h = (F.col("token_id") * SIMHASH_A + SIMHASH_B) % (2**SIMHASH_BITS)
    t = t.withColumn("h", h.cast("long"))
    bits = spark.range(SIMHASH_BITS).select(F.col("id").cast("int").alias("bit"))
    votes = (
        t.crossJoin(F.broadcast(bits))
        .withColumn(
            "vote",
            # shift amount is a column -> SQL-expression form (the Python
            # shiftright helper only takes literal counts)
            F.when(
                F.expr("(h >> bit) & 1") == 1, F.col("cnt")
            ).otherwise(-F.col("cnt")),
        )
        .groupBy("doc_id", "bit")
        .agg(F.sum("vote").alias("s"))
    )
    return votes.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), bit)")).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("simhash")
    )


_SIMHASH_CTES = (
    corpus.SQL_TOK_CTE.strip()
    + f""",
v AS (
    SELECT word, CAST(DENSE_RANK() OVER (ORDER BY word) AS BIGINT) AS token_id
    FROM (SELECT DISTINCT word FROM tok)
),
t AS (
    SELECT doc_id, token_id, COUNT(*) AS cnt,
           (token_id * {SIMHASH_A} + {SIMHASH_B}) % {2**SIMHASH_BITS} AS h
    FROM tok JOIN v USING (word)
    GROUP BY doc_id, token_id
),
votes AS (
    SELECT doc_id, CAST(b.bit AS INT) AS bit,
           SUM(CASE WHEN (h >> CAST(b.bit AS INT)) & 1 = 1 THEN cnt ELSE -cnt END) AS s
    FROM t CROSS JOIN range({SIMHASH_BITS}) b(bit)
    GROUP BY doc_id, CAST(b.bit AS INT)
),
shs AS (
    SELECT doc_id,
           CAST(SUM(CASE WHEN s > 0 THEN 1::BIGINT << bit ELSE 0 END) AS BIGINT)
               AS simhash
    FROM votes
    GROUP BY doc_id
)"""
)


def sql_simhash_docs() -> str:
    return "WITH " + _SIMHASH_CTES + "\nSELECT doc_id, simhash FROM shs"


def simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= SIMHASH_MAX_HAMMING.

    Band trick: 4 bands of 4 bits; hamming<=3 pairs must agree on at
    least one band (pigeonhole), so the self-join runs per band bucket —
    never all-pairs. Verified with exact bit_count(xor).
    """
    sh = simhash_docs(spark, sf_dir)
    bands = spark.range(NUM_BANDS).select(F.col("id").cast("int").alias("band"))
    banded = sh.crossJoin(F.broadcast(bands)).withColumn(
        "band_val", F.expr("(simhash >> (band * 4)) & 15")
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, ["band", "band_val"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.select("doc_a", "doc_b", ham.cast("int").alias("hamming"))
        .where(F.col("hamming") <= SIMHASH_MAX_HAMMING)
    )


def sql_simhash_pairs() -> str:
    return (
        "WITH "
        + _SIMHASH_CTES
        + f""",
banded AS (
    SELECT doc_id, simhash, CAST(b.band AS INT) AS band,
           (simhash >> (CAST(b.band AS INT) * 4)) & 15 AS band_val
    FROM shs CROSS JOIN range({NUM_BANDS}) b(band)
),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           a.simhash AS sh_a, b.simhash AS sh_b
    FROM banded a JOIN banded b USING (band, band_val)
    WHERE a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(sh_a, sh_b)) AS INT) AS hamming
FROM cand
WHERE bit_count(xor(sh_a, sh_b)) <= {SIMHASH_MAX_HAMMING}"""
    )
