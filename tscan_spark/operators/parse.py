"""Parse-tree operators (SURVEY.md §2.8) over synthesized dependency
trees.

The reference computes its syntactic battery by XPath over per-sentence
Alpino trees (P1 dependency distances, Alpino.cxx:294-614; P2 D-level,
Alpino.cxx:728-954). The engine consumes *pre-parsed* node arrays
(SURVEY §1.3); the testdata ships none, so :func:`synth_parses` derives
a deterministic dependency tree per sentence (same single-source-of-
truth trick as the synthetic Frog): token i attaches to

    parent(i) = 0 if i == 0 else (i - 1 if i % 3 != 0 else i // 2)

giving chains with occasional long arcs — enough structure to exercise
both operators:

- :func:`dep_distance` — P1 analog: per-arc distance |i - parent(i)|,
  sentence grain mean + max, document grain = **mean of sentence means
  and mean of sentence maxima** (the A7 avg-of-avgs semantics,
  src/structstats.cxx:28-54 — NOT a flat mean; the flat mean is also
  emitted so the difference is visible/testable).
- :func:`tree_depth` — iterative parent-chain walk (depth of each node),
  a genuinely sequential tree traversal run as an Arrow kernel over
  sentence node arrays, with a recursive-CTE oracle. Stand-in for the
  D-level cascade's tree-walking shape (P2).
"""

from __future__ import annotations

from functools import lru_cache

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tscan_spark import corpus
from tscan_spark.functions.scalars import (
    fp_mean,
    round6_fp,
    sql_fp_mean,
    sql_fp_sum,
    sql_round6_fp,
)

# parent rule constants (single source of truth; mirrored in SQL)
# parent(0) = 0 (root); i % 3 != 0 -> i - 1 (chain); else i // 2 (arc)


def _with_parent(tok: DataFrame) -> DataFrame:
    i = F.col("tok_i")
    parent = F.when(i == 0, 0).when(i % 3 != 0, i - 1).otherwise(F.floor(i / 2)).cast(
        "int"
    )
    return tok.withColumn("parent", parent)


def _sent_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = corpus.tokens_long(corpus.load(spark, sf_dir, "documents"))
    # token index within the sentence
    return tok.withColumn(
        "tok_i", (F.col("word_idx") % corpus.SENT_LEN).cast("int")
    )


SQL_SENT_TOK_CTE = f"""
stok AS (
    SELECT tok.*,
           CAST(word_idx % {corpus.SENT_LEN} AS INT) AS tok_i,
           CAST(CASE WHEN word_idx % {corpus.SENT_LEN} = 0 THEN 0
                     WHEN (word_idx % {corpus.SENT_LEN}) % 3 <> 0
                          THEN word_idx % {corpus.SENT_LEN} - 1
                     ELSE (word_idx % {corpus.SENT_LEN}) // 2 END AS INT) AS parent
    FROM tok
)"""


def dep_distance(
    spark: SparkSession, sf_dir: str, nodes: DataFrame | None = None
) -> DataFrame:
    """P1/A7: dependency distances with doc-grain avg-of-avgs semantics.

    Per arc: dist = |tok_i - parent| (root arc excluded). Sentence grain
    mean/max; doc grain = mean of sentence means (al_gem analog), mean
    of sentence maxima (al_max analog), plus the flat token-grain mean
    (al_gem_flat) to pin the avg-of-avgs distinction.
    """
    if nodes is None:
        tok = _with_parent(_sent_tokens(spark, sf_dir))
    else:
        tok = nodes
    tok = tok.where(F.col("tok_i") > 0)
    dist = F.abs(F.col("tok_i") - F.col("parent"))
    sent = tok.groupBy("doc_id", "sent_idx").agg(
        F.round(F.avg(dist), 6).alias("sent_mean"),
        F.max(dist).alias("sent_max"),
        F.count(F.lit(1)).alias("n_arcs"),
        F.sum(dist).alias("sum_dist"),
    )
    doc = sent.groupBy("doc_id").agg(
        # avg-of-avgs: fixed-point over the rounded sentence means
        round6_fp(
            F.sum(F.round(F.col("sent_mean") * 1e6, 0).cast("long"))
            / 1e6
            / F.count(F.lit(1))
        ).alias("al_gem"),
        F.round(F.avg(F.col("sent_max").cast("double")), 6).alias("al_max"),
        F.round(F.sum("sum_dist") / F.sum("n_arcs"), 6).alias("al_gem_flat"),
        F.count(F.lit(1)).alias("sent_cnt"),
    )
    return doc.withColumn("sent_cnt", F.col("sent_cnt").cast("long"))


def sql_dep_distance() -> str:
    return (
        "WITH "
        + corpus.SQL_TOK_CTE.strip()
        + ",\n"
        + SQL_SENT_TOK_CTE.strip()
        + """,
arcs AS (
    SELECT doc_id, sent_idx, ABS(tok_i - parent) AS dist
    FROM stok WHERE tok_i > 0
),
sentd AS (
    SELECT doc_id, sent_idx,
           ROUND(AVG(dist), 6) AS sent_mean,
           MAX(dist) AS sent_max,
           COUNT(*) AS n_arcs,
           SUM(dist) AS sum_dist
    FROM arcs GROUP BY doc_id, sent_idx
)
SELECT doc_id,
       """
        + sql_round6_fp("SUM(CAST(ROUND(sent_mean * 1e6, 0) AS BIGINT)) / 1e6 / COUNT(*)")
        + """
           AS al_gem,
       ROUND(AVG(CAST(sent_max AS DOUBLE)), 6) AS al_max,
       ROUND(SUM(sum_dist) * 1.0 / SUM(n_arcs), 6) AS al_gem_flat,
       CAST(COUNT(*) AS BIGINT) AS sent_cnt
FROM sentd
GROUP BY doc_id"""
    )


def tree_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative parent-chain depth per node -> sentence depth stats.

    The depth walk (follow parent links to the root) is inherently
    sequential per node — the tree-walk kernel shape of the reference's
    parse batteries — run as mapInPandas over sentence node arrays.
    Output: (doc_id, sent_idx, max_depth, sum_depth).
    """
    tok = _with_parent(_sent_tokens(spark, sf_dir))
    grouped = tok.groupBy("doc_id", "sent_idx").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("tok_i", F.col("parent").alias("p")))),
            lambda s: s["p"],
        ).alias("parents")
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            max_d, sum_d = [], []
            for parents in pdf["parents"]:
                parents = list(parents)
                depths = [0] * len(parents)
                for i in range(1, len(parents)):
                    # parent(i) < i always, so one pass suffices
                    depths[i] = depths[parents[i]] + 1
                max_d.append(max(depths) if depths else 0)
                sum_d.append(sum(depths))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sent_idx": pdf["sent_idx"],
                    "max_depth": max_d,
                    "sum_depth": sum_d,
                }
            )

    return grouped.mapInPandas(
        kernel, schema="doc_id long, sent_idx int, max_depth int, sum_depth long"
    )


# ---------------------------------------------------------------------------
# P2-P8 battery over synthesized node attributes
# ---------------------------------------------------------------------------
#
# The reference evaluates these by XPath over Alpino trees; here every
# node carries deterministic (rel, cat) attributes derived from the
# token (same single-source-of-truth trick as the synthetic Frog), and
# each operator is the Spark-native form of the corresponding XPath
# count:
#
#   rel(i):  'root' for i=0; 'predm' when i%7==0; else by i%5:
#            1->'mod', 2->'su', 3->'obj1', 4->'cnj', 0->'vc'
#   cat(i):  WW -> smain/ssub/sv1 by i%3; VG -> 'conj'; N -> 'np';
#            ADJ -> 'rel'/'cp' by i%2; else 'other'
#
# Counts (reference analogs):
#   P5 resolveFiniteVerbs  (sentstats.cxx:684-691): smain/ssub/sv1 by cat
#   P6 resolveConjunctions (sentstats.cxx:698-703): rel='cnj' x clause cat
#   P7 resolveSmallConjunctions (sentstats.cxx:706-716): cnj, non-clause cat
#   P3 resolveAdverbials   (tscan.cxx:2998-3012): mod|predm under clause cat
#   P4 resolveRelativeClauses (sentstats.cxx:544-677): rel/cp clauses by
#      parent rel (betr/bijw/compl + loose variants)
#   P8 mod_stats           (Alpino.cxx:987-996): mod/det under np
#   P2 get_d_level         (Alpino.cxx:728-954): 7..0 cascade
#   D7 correctedClauseCnt  (sentstats.cxx:690, structstats.cxx:1549):
#      max(clauseCnt,1) at sentence grain, SUMMED at doc grain
#   dLevel -1 = parse missing, excluded from doc means
#      (structstats.cxx:1620-1625): synthetic rule = sentences with
#      fewer than MIN_PARSE_TOKENS tokens

CLAUSE_CATS = ["smain", "ssub", "sv1"]
MIN_PARSE_TOKENS = 3  # below this the synthetic "parse" is missing


def _rel_expr() -> F.Column:
    i = F.col("tok_i")
    return (
        F.when(i == 0, "root")
        .when(i % 7 == 0, "predm")
        .when(i % 5 == 1, "mod")
        .when(i % 5 == 2, "su")
        .when(i % 5 == 3, "obj1")
        .when(i % 5 == 4, "cnj")
        .otherwise("vc")
    )


def _cat_expr() -> F.Column:
    i, tag = F.col("tok_i"), F.col("tag")
    return (
        F.when(tag == "WW", F.when(i % 3 == 0, "smain").when(i % 3 == 1, "ssub").otherwise("sv1"))
        .when(tag == "VG", "conj")
        .when(tag == "N", "np")
        .when(tag == "VZ", "pp")
        .when(tag == "ADJ", F.when(i % 2 == 0, "rel").otherwise("cp"))
        .otherwise("other")
    )


SQL_REL = """CASE WHEN tok_i = 0 THEN 'root'
         WHEN tok_i % 7 = 0 THEN 'predm'
         WHEN tok_i % 5 = 1 THEN 'mod'
         WHEN tok_i % 5 = 2 THEN 'su'
         WHEN tok_i % 5 = 3 THEN 'obj1'
         WHEN tok_i % 5 = 4 THEN 'cnj'
         ELSE 'vc' END"""

# P1 full-space attributes: the 17 dependency-pair types live in the
# richer Alpino attribute space (rel x pos x cat x lcat) than the coarse
# clause-battery rel above. fine_rel widens the dependency-relation
# alphabet to the full set the reference's getDependencyDist branches on
# (Alpino.cxx:294-614) — deterministic in (position, word) so every
# value occurs across sentences despite the 10-token sentence geometry;
# lcat is the reference's lexical-category attribute (part/np/ap/advp)
# that subtypes svp/predc/mod pairs.
FINE_RELS = [
    "su", "obj1", "obj2", "vc", "svp", "predc",
    "mod", "det", "body", "cnj", "pp", "cp",
]
LCATS = ["part", "np", "ap", "advp"]


def _fine_rel_expr() -> F.Column:
    i = F.col("tok_i")
    k = (i * 7 + F.length(F.col("word"))) % len(FINE_RELS)
    expr = F.lit(FINE_RELS[-1])
    for j, r in reversed(list(enumerate(FINE_RELS[:-1]))):
        expr = F.when(k == j, r).otherwise(expr)
    return F.when(i == 0, "root").otherwise(expr)


def _lcat_expr() -> F.Column:
    m = (F.col("tok_i") + F.ascii(F.substring(F.col("word"), 1, 1))) % len(LCATS)
    expr = F.lit(LCATS[-1])
    for j, c in reversed(list(enumerate(LCATS[:-1]))):
        expr = F.when(m == j, c).otherwise(expr)
    return expr


def _sql_fine_rel() -> str:
    arms = "\n         ".join(
        f"WHEN (tok_i * 7 + length(word)) % {len(FINE_RELS)} = {j} THEN '{r}'"
        for j, r in enumerate(FINE_RELS[:-1])
    )
    return (
        "CASE WHEN tok_i = 0 THEN 'root'\n         "
        + arms
        + f"\n         ELSE '{FINE_RELS[-1]}' END"
    )


def _sql_lcat() -> str:
    arms = "\n         ".join(
        f"WHEN (tok_i + ascii(substring(word, 1, 1))) % {len(LCATS)} = {j} THEN '{c}'"
        for j, c in enumerate(LCATS[:-1])
    )
    return "CASE " + arms + f"\n         ELSE '{LCATS[-1]}' END"

SQL_CAT = """CASE WHEN tag = 'WW' THEN
              CASE WHEN tok_i % 3 = 0 THEN 'smain'
                   WHEN tok_i % 3 = 1 THEN 'ssub' ELSE 'sv1' END
         WHEN tag = 'VG' THEN 'conj'
         WHEN tag = 'N' THEN 'np'
         WHEN tag = 'VZ' THEN 'pp'
         WHEN tag = 'ADJ' THEN
              CASE WHEN tok_i % 2 = 0 THEN 'rel' ELSE 'cp' END
         ELSE 'other' END"""


def parse_nodes(
    spark: SparkSession, sf_dir: str, tok: DataFrame | None = None
) -> DataFrame:
    """The synthesized per-sentence node table (FIXTURES.md §3 shape,
    flattened): (doc_id, sent_idx, tok_i, parent, tag, rel, cat,
    fine_rel, lcat).

    ``tok`` lets a caller (the unified profile) feed a pre-annotated
    token grain so every parse battery shares ONE scan lineage instead
    of re-deriving its own.
    """
    from tscan_spark import annotate

    if tok is None:
        tok = _with_parent(_sent_tokens(spark, sf_dir))
        tok = tok.withColumn("tag", annotate.tag_expr(F.col("word")))
    else:
        tok = tok.select("doc_id", "sent_idx", "word_idx", "word", "tag")
        tok = tok.withColumn(
            "tok_i", (F.col("word_idx") % corpus.SENT_LEN).cast("int")
        )
        tok = _with_parent(tok)
    return tok.select(
        "doc_id",
        "sent_idx",
        "tok_i",
        "parent",
        "word",
        "tag",
        _rel_expr().alias("rel"),
        _cat_expr().alias("cat"),
        _fine_rel_expr().alias("fine_rel"),
        _lcat_expr().alias("lcat"),
    )


SQL_NODES_CTE = """
nodes AS (
    SELECT doc_id, sent_idx, tok_i, parent, word, tag,
           {sql_rel} AS rel,
           {sql_cat} AS cat,
           {sql_fine_rel} AS fine_rel,
           {sql_lcat} AS lcat
    FROM (
        SELECT stok.*, {sql_tag} AS tag FROM stok
    )
)"""


def _sql_nodes() -> str:
    from tscan_spark import annotate

    return SQL_NODES_CTE.format(
        sql_tag=annotate.sql_tag("word"),
        sql_rel=SQL_REL,
        sql_cat=SQL_CAT,
        sql_fine_rel=_sql_fine_rel(),
        sql_lcat=_sql_lcat(),
    ).strip()


def clause_counts(
    spark: SparkSession, sf_dir: str, nodes: DataFrame | None = None
) -> DataFrame:
    """P3-P8 + P2 sentence battery as ONE aggregation over the
    parent-joined node table.

    The parent attributes come from a single self-equi-join keyed by
    (doc_id, sent_idx, parent) — co-partitioned with the node table, so
    at scale this is one shuffle on the sentence key (bounded groups:
    sentence length), then every count is an indicator sum in the same
    partial+final hash aggregate. No UDFs anywhere.
    """
    if nodes is None:
        nodes = parse_nodes(spark, sf_dir)
    par = nodes.select(
        F.col("doc_id").alias("p_doc"),
        F.col("sent_idx").alias("p_sent"),
        F.col("tok_i").alias("p_tok"),
        F.col("rel").alias("p_rel"),
        F.col("cat").alias("p_cat"),
    )
    j = nodes.join(
        par,
        (F.col("doc_id") == F.col("p_doc"))
        & (F.col("sent_idx") == F.col("p_sent"))
        & (F.col("parent") == F.col("p_tok"))
        & (F.col("tok_i") > 0),  # the root has no parent
        "left",
    )
    sent = j.groupBy("doc_id", "sent_idx").agg(*_clause_sent_aggs())
    return sent.select(*_clause_out_cols())


@lru_cache(maxsize=None)
def _clause_sent_aggs() -> tuple:
    is_clause = F.col("cat").isin(CLAUSE_CATS)
    p_clause = F.col("p_cat").isin(CLAUSE_CATS)
    # when/otherwise, NOT cond.cast(int): conditions over the root's
    # NULL parent attributes must count 0 like the oracle's CASE WHEN
    # (a single-token sentence would otherwise sum to NULL)
    cnt = lambda cond, name: F.sum(F.when(cond, 1).otherwise(0)).alias(name)
    return (
        F.count(F.lit(1)).alias("n_nodes"),
        cnt(F.col("cat") == "smain", "smain_cnt"),
        cnt(F.col("cat") == "ssub", "ssub_cnt"),
        cnt(F.col("cat") == "sv1", "sv1_cnt"),
        cnt((F.col("rel") == "cnj") & (F.col("cat") == "smain"), "cnj_smain_cnt"),
        cnt((F.col("rel") == "cnj") & (F.col("cat") == "ssub"), "cnj_ssub_cnt"),
        cnt((F.col("rel") == "cnj") & (F.col("cat") == "sv1"), "cnj_sv1_cnt"),
        cnt((F.col("rel") == "cnj") & ~is_clause, "small_cnj_cnt"),
        cnt(F.col("rel").isin("mod", "predm") & p_clause, "adverbial_cnt"),
        cnt((F.col("cat") == "rel") & (F.col("rel") == "mod"), "betr_cnt"),
        cnt((F.col("cat") == "cp") & p_clause, "bijw_cnt"),
        cnt((F.col("cat") == "cp") & (F.col("rel") == "vc"), "compl_cnt"),
        # F4 infinitival-complement analog (Infin_compl_bep_per_zin,
        # structstats.cxx:408): the vc-complement whose head word
        # carries the non-finite analog form — nests under compl_cnt
        # like the reference's ti/oti cats nest under cp complements
        cnt(
            (F.col("cat") == "cp")
            & (F.col("rel") == "vc")
            & (F.length("word") % 2 == 1),
            "infin_compl_cnt",
        ),
        cnt((F.col("cat") == "rel") & (F.col("p_rel") == "root"), "los_betr_cnt"),
        cnt(F.col("cat") == "np", "np_cnt"),
        cnt((F.col("rel") == "mod") & (F.col("p_cat") == "np"), "np_mod_cnt"),
        # D-level cascade inputs
        cnt(is_clause & (F.col("rel") != "cnj"), "_fin_noncoord"),
        cnt((F.col("cat") == "rel") & (F.col("p_rel") == "su"), "_rel_on_su"),
        cnt((F.col("tag") == "VG") & (F.col("tok_i") % 2 == 1), "_subord"),
        cnt((F.col("rel") == "su") & (F.col("p_rel") == "vc"), "_vc_own_su"),
        cnt((F.col("cat") == "rel") & (F.col("p_rel") == "obj1"), "_rel_on_obj"),
        cnt(F.col("rel") == "cnj", "_coord"),
        cnt((F.col("tag") == "WW") & (F.length("word") % 2 == 1), "_inf"),
    )


@lru_cache(maxsize=None)
def _clause_out_cols() -> tuple:
    clause_cnt = F.col("smain_cnt") + F.col("ssub_cnt") + F.col("sv1_cnt")
    d_level = (
        F.when(F.col("n_nodes") < MIN_PARSE_TOKENS, -1)  # parse missing
        .when(F.col("_fin_noncoord") > 2, 7)
        .when(F.col("_rel_on_su") > 0, 6)
        .when(F.col("_subord") > 0, 5)
        .when(F.col("_vc_own_su") > 0, 4)
        .when(F.col("_rel_on_obj") > 0, 3)
        .when(F.col("_coord") > 0, 2)
        .when(F.col("_inf") > 0, 1)
        .otherwise(0)
    )
    keep = [
        "n_nodes",
        "smain_cnt",
        "ssub_cnt",
        "sv1_cnt",
        "cnj_smain_cnt",
        "cnj_ssub_cnt",
        "cnj_sv1_cnt",
        "small_cnj_cnt",
        "adverbial_cnt",
        "betr_cnt",
        "bijw_cnt",
        "compl_cnt",
        "infin_compl_cnt",
        "los_betr_cnt",
        "np_cnt",
        "np_mod_cnt",
    ]
    return (
        "doc_id",
        F.col("sent_idx").cast("int").alias("sent_idx"),
        *[F.col(c).cast("int").alias(c) for c in keep],
        clause_cnt.cast("int").alias("clause_cnt"),
        F.greatest(clause_cnt, F.lit(1)).cast("int").alias("corrected_clause_cnt"),
        d_level.cast("int").alias("d_level"),
    )


def _sql_clause_sent() -> str:
    """Shared oracle CTE chain ending in a `sentp` sentence battery."""
    return (
        "WITH "
        + corpus.SQL_TOK_CTE.strip()
        + ",\n"
        + SQL_SENT_TOK_CTE.strip()
        + ",\n"
        + _sql_nodes()
        + f""",
j AS (
    SELECT n.*, p.rel AS p_rel, p.cat AS p_cat
    FROM nodes n
    LEFT JOIN nodes p
      ON p.doc_id = n.doc_id AND p.sent_idx = n.sent_idx
     AND p.tok_i = n.parent AND n.tok_i > 0
),
sentp AS (
    SELECT doc_id, sent_idx,
           COUNT(*) AS n_nodes,
           SUM(CASE WHEN cat = 'smain' THEN 1 ELSE 0 END) AS smain_cnt,
           SUM(CASE WHEN cat = 'ssub' THEN 1 ELSE 0 END) AS ssub_cnt,
           SUM(CASE WHEN cat = 'sv1' THEN 1 ELSE 0 END) AS sv1_cnt,
           SUM(CASE WHEN rel = 'cnj' AND cat = 'smain' THEN 1 ELSE 0 END) AS cnj_smain_cnt,
           SUM(CASE WHEN rel = 'cnj' AND cat = 'ssub' THEN 1 ELSE 0 END) AS cnj_ssub_cnt,
           SUM(CASE WHEN rel = 'cnj' AND cat = 'sv1' THEN 1 ELSE 0 END) AS cnj_sv1_cnt,
           SUM(CASE WHEN rel = 'cnj' AND cat NOT IN ('smain','ssub','sv1')
                    THEN 1 ELSE 0 END) AS small_cnj_cnt,
           SUM(CASE WHEN rel IN ('mod','predm')
                     AND p_cat IN ('smain','ssub','sv1') THEN 1 ELSE 0 END)
               AS adverbial_cnt,
           SUM(CASE WHEN cat = 'rel' AND rel = 'mod' THEN 1 ELSE 0 END) AS betr_cnt,
           SUM(CASE WHEN cat = 'cp' AND p_cat IN ('smain','ssub','sv1')
                    THEN 1 ELSE 0 END) AS bijw_cnt,
           SUM(CASE WHEN cat = 'cp' AND rel = 'vc' THEN 1 ELSE 0 END) AS compl_cnt,
           SUM(CASE WHEN cat = 'cp' AND rel = 'vc' AND length(word) % 2 = 1
                    THEN 1 ELSE 0 END) AS infin_compl_cnt,
           SUM(CASE WHEN cat = 'rel' AND p_rel = 'root' THEN 1 ELSE 0 END)
               AS los_betr_cnt,
           SUM(CASE WHEN cat = 'np' THEN 1 ELSE 0 END) AS np_cnt,
           SUM(CASE WHEN rel = 'mod' AND p_cat = 'np' THEN 1 ELSE 0 END) AS np_mod_cnt,
           SUM(CASE WHEN cat IN ('smain','ssub','sv1') AND rel <> 'cnj'
                    THEN 1 ELSE 0 END) AS fin_noncoord,
           SUM(CASE WHEN cat = 'rel' AND p_rel = 'su' THEN 1 ELSE 0 END) AS rel_on_su,
           SUM(CASE WHEN tag = 'VG' AND tok_i % 2 = 1 THEN 1 ELSE 0 END) AS subord,
           SUM(CASE WHEN rel = 'su' AND p_rel = 'vc' THEN 1 ELSE 0 END) AS vc_own_su,
           SUM(CASE WHEN cat = 'rel' AND p_rel = 'obj1' THEN 1 ELSE 0 END) AS rel_on_obj,
           SUM(CASE WHEN rel = 'cnj' THEN 1 ELSE 0 END) AS coord,
           SUM(CASE WHEN tag = 'WW' AND length(word) % 2 = 1 THEN 1 ELSE 0 END) AS inf
    FROM j
    GROUP BY doc_id, sent_idx
),
sentd AS (
    SELECT *,
           smain_cnt + ssub_cnt + sv1_cnt AS clause_cnt,
           GREATEST(smain_cnt + ssub_cnt + sv1_cnt, 1) AS corrected_clause_cnt,
           CASE WHEN n_nodes < {MIN_PARSE_TOKENS} THEN -1
                WHEN fin_noncoord > 2 THEN 7
                WHEN rel_on_su > 0 THEN 6
                WHEN subord > 0 THEN 5
                WHEN vc_own_su > 0 THEN 4
                WHEN rel_on_obj > 0 THEN 3
                WHEN coord > 0 THEN 2
                WHEN inf > 0 THEN 1
                ELSE 0 END AS d_level
    FROM sentp
)"""
    )


_CLAUSE_KEEP = [
    "n_nodes",
    "smain_cnt",
    "ssub_cnt",
    "sv1_cnt",
    "cnj_smain_cnt",
    "cnj_ssub_cnt",
    "cnj_sv1_cnt",
    "small_cnj_cnt",
    "adverbial_cnt",
    "betr_cnt",
    "bijw_cnt",
    "compl_cnt",
    "infin_compl_cnt",
    "los_betr_cnt",
    "np_cnt",
    "np_mod_cnt",
    "clause_cnt",
    "corrected_clause_cnt",
    "d_level",
]


def sql_clause_counts() -> str:
    cols = ",\n       ".join(f"CAST({c} AS INT) AS {c}" for c in _CLAUSE_KEEP)
    return (
        _sql_clause_sent()
        + f"""
SELECT doc_id, CAST(sent_idx AS INT) AS sent_idx,
       {cols}
FROM sentd"""
    )


def doc_parse_summary(
    spark: SparkSession, sf_dir: str, nodes: DataFrame | None = None
) -> DataFrame:
    """Doc-grain parse summary with the reference merge quirks:

    - corrected_clause_cnt is SUMMED over sentences (each clamped to
      >= 1 at sentence grain — NOT re-clamped at doc grain, D7);
    - d_level -1 (missing parse) is excluded from the doc mean and
      counted as parse_fail_cnt (structstats.cxx:1620-1625, 336-370);
    - clause density per 1000 nodes (density() semantics).
    """
    sent = clause_counts(spark, sf_dir, nodes=nodes)
    ok = F.col("d_level") >= 0
    doc_sums = [
        "smain_cnt", "ssub_cnt", "sv1_cnt", "cnj_smain_cnt", "cnj_ssub_cnt",
        "cnj_sv1_cnt", "small_cnj_cnt", "adverbial_cnt", "los_betr_cnt",
        "np_mod_cnt", "infin_compl_cnt",
    ]
    doc = sent.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("sent_cnt"),
        F.sum("clause_cnt").cast("long").alias("clause_cnt"),
        F.sum("corrected_clause_cnt").cast("long").alias("corrected_clause_cnt"),
        F.sum((~ok).cast("int")).cast("long").alias("parse_fail_cnt"),
        F.sum(F.when(ok, F.col("d_level"))).cast("long").alias("_dsum"),
        F.sum(ok.cast("int")).alias("_dcnt"),
        # D_level_gt4_p numerator (structstats.cxx:1616-1619)
        F.sum((F.col("d_level") > 4).cast("int")).cast("long").alias("d_level_gt4_cnt"),
        F.sum("n_nodes").cast("long").alias("node_cnt"),
        F.sum("betr_cnt").cast("long").alias("betr_cnt"),
        F.sum("bijw_cnt").cast("long").alias("bijw_cnt"),
        F.sum("compl_cnt").cast("long").alias("compl_cnt"),
        *[F.sum(c).cast("long").alias(c) for c in doc_sums],
    )
    return doc.select(
        "doc_id",
        "sent_cnt",
        "clause_cnt",
        "corrected_clause_cnt",
        "parse_fail_cnt",
        "node_cnt",
        "betr_cnt",
        "bijw_cnt",
        "compl_cnt",
        *doc_sums,
        "d_level_gt4_cnt",
        F.round(
            F.when(F.col("_dcnt") > 0, F.col("_dsum") / F.col("_dcnt")), 6
        ).alias("d_level_avg"),
        F.round(F.col("clause_cnt") * 1000.0 / F.col("node_cnt"), 6).alias(
            "clause_d"
        ),
    )


def sql_doc_parse_summary() -> str:
    doc_sums = [
        "smain_cnt", "ssub_cnt", "sv1_cnt", "cnj_smain_cnt", "cnj_ssub_cnt",
        "cnj_sv1_cnt", "small_cnj_cnt", "adverbial_cnt", "los_betr_cnt",
        "np_mod_cnt", "infin_compl_cnt",
    ]
    sums = ",\n       ".join(f"CAST(SUM({c}) AS BIGINT) AS {c}" for c in doc_sums)
    return (
        _sql_clause_sent()
        + f"""
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS sent_cnt,
       CAST(SUM(clause_cnt) AS BIGINT) AS clause_cnt,
       CAST(SUM(corrected_clause_cnt) AS BIGINT) AS corrected_clause_cnt,
       CAST(SUM(CASE WHEN d_level < 0 THEN 1 ELSE 0 END) AS BIGINT) AS parse_fail_cnt,
       CAST(SUM(n_nodes) AS BIGINT) AS node_cnt,
       CAST(SUM(betr_cnt) AS BIGINT) AS betr_cnt,
       CAST(SUM(bijw_cnt) AS BIGINT) AS bijw_cnt,
       CAST(SUM(compl_cnt) AS BIGINT) AS compl_cnt,
       {sums},
       CAST(SUM(CASE WHEN d_level > 4 THEN 1 ELSE 0 END) AS BIGINT)
           AS d_level_gt4_cnt,
       ROUND(CASE WHEN SUM(CASE WHEN d_level >= 0 THEN 1 ELSE 0 END) > 0
                  THEN SUM(CASE WHEN d_level >= 0 THEN d_level ELSE 0 END) * 1.0
                       / SUM(CASE WHEN d_level >= 0 THEN 1 ELSE 0 END) END, 6)
           AS d_level_avg,
       ROUND(SUM(clause_cnt) * 1000.0 / SUM(n_nodes), 6) AS clause_d
FROM sentd
GROUP BY doc_id"""
    )


def embedded_clauses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 embedding analog (mvInbedCnt): clause-cat nodes that sit
    inside another clause — an ancestor walk per node, run as an Arrow
    kernel over sentence node arrays (the genuinely sequential part of
    the battery; everything countable without a walk stays in
    clause_counts as plain aggregates).

    Output: (doc_id, sent_idx, embed_cnt, max_clause_depth).
    """
    nodes = parse_nodes(spark, sf_dir)
    grouped = nodes.groupBy("doc_id", "sent_idx").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    "tok_i",
                    F.col("parent").alias("p"),
                    F.col("cat").isin(CLAUSE_CATS).cast("int").alias("c"),
                )
            )
        ).alias("ns")
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            emb, mdep = [], []
            for ns in pdf["ns"]:
                parents = [int(n["p"]) for n in ns]
                clause = [int(n["c"]) for n in ns]
                # clause-nesting depth per node: #clause ancestors
                # (parent(i) < i, so one forward pass suffices)
                cdep = [0] * len(parents)
                for i in range(1, len(parents)):
                    cdep[i] = cdep[parents[i]] + clause[parents[i]]
                emb.append(sum(1 for i in range(len(parents)) if clause[i] and cdep[i] > 0))
                mdep.append(max((cdep[i] + clause[i] for i in range(len(parents))), default=0))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sent_idx": pdf["sent_idx"],
                    "embed_cnt": emb,
                    "max_clause_depth": mdep,
                }
            )

    return grouped.mapInPandas(
        kernel,
        schema="doc_id long, sent_idx int, embed_cnt int, max_clause_depth int",
    )


def sql_embedded_clauses() -> str:
    """Recursive-CTE oracle: per node, count clause ancestors."""
    return (
        "WITH RECURSIVE "
        + corpus.SQL_TOK_CTE.strip()
        + ",\n"
        + SQL_SENT_TOK_CTE.strip()
        + ",\n"
        + _sql_nodes()
        + """,
walk (doc_id, sent_idx, node, is_clause, cur, cdep) AS (
    SELECT doc_id, sent_idx, tok_i,
           CASE WHEN cat IN ('smain','ssub','sv1') THEN 1 ELSE 0 END,
           tok_i, 0
    FROM nodes
    UNION ALL
    SELECT w.doc_id, w.sent_idx, w.node, w.is_clause, s.parent,
           w.cdep + CASE WHEN s2.cat IN ('smain','ssub','sv1') THEN 1 ELSE 0 END
    FROM walk w
    JOIN nodes s ON s.doc_id = w.doc_id AND s.sent_idx = w.sent_idx
                AND s.tok_i = w.cur
    JOIN nodes s2 ON s2.doc_id = w.doc_id AND s2.sent_idx = w.sent_idx
                 AND s2.tok_i = s.parent
    WHERE w.cur > 0
),
per_node AS (
    SELECT doc_id, sent_idx, node, is_clause, MAX(cdep) AS cdep
    FROM walk GROUP BY doc_id, sent_idx, node, is_clause
)
SELECT doc_id, CAST(sent_idx AS INT) AS sent_idx,
       CAST(SUM(CASE WHEN is_clause = 1 AND cdep > 0 THEN 1 ELSE 0 END) AS INT)
           AS embed_cnt,
       CAST(COALESCE(MAX(cdep + is_clause), 0) AS INT) AS max_clause_depth
FROM per_node
GROUP BY doc_id, sent_idx"""
    )


def sql_tree_depth() -> str:
    """Recursive-CTE oracle: walk each node's parent chain to the root."""
    return (
        "WITH RECURSIVE "
        + corpus.SQL_TOK_CTE.strip()
        + ",\n"
        + SQL_SENT_TOK_CTE.strip()
        + """,
walk (doc_id, sent_idx, node, cur, depth) AS (
    SELECT doc_id, sent_idx, tok_i, tok_i, 0 FROM stok
    UNION ALL
    SELECT w.doc_id, w.sent_idx, w.node, s.parent, w.depth + 1
    FROM walk w
    JOIN stok s ON s.doc_id = w.doc_id AND s.sent_idx = w.sent_idx
               AND s.tok_i = w.cur
    WHERE w.cur > 0
),
depths AS (
    SELECT doc_id, sent_idx, node, MAX(depth) AS depth
    FROM walk GROUP BY doc_id, sent_idx, node
)
SELECT doc_id, CAST(sent_idx AS INT) AS sent_idx,
       CAST(MAX(depth) AS INT) AS max_depth,
       CAST(SUM(depth) AS BIGINT) AS sum_depth
FROM depths
GROUP BY doc_id, sent_idx"""
    )


# ---------------------------------------------------------------------------
# W29 verb classification + W28 imperative (Alpino.cxx:640-726, 956-966)
# ---------------------------------------------------------------------------
#
# The reference classifies each verb by lemma class + sibling relations:
#   PASSIVE: lemma zijn/worden with sc="passive"       (Alpino.cxx:650-662)
#   COPULA:  koppel-lemma with a predc sibling          (663-671)
#   TIME:    zullen; hebben with a vc sibling; zijn     (687-708)
#   MODAL:   modal-lemma list                           (692-694)
#   HEAD:    everything else                            (724)
# and flags a clause imperative when no sibling bears rel su/sup
# (checkImp, Alpino.cxx:956-966).
#
# Synthetic analogs over the deterministic node table (lemmas here are
# the WW-tagged vocabulary; 'predm' stands in for predc — the node
# taxonomy has no separate predc):
PASSIVE_AUX_LEMMA = "merge"  # zijn/worden analog
KOPPEL_LEMMAS = ["hash"]  # koppels
MODAL_LEMMAS = ["group", "key"]  # modals list
TIME_LEMMA = "line"  # zullen
HEBBEN_LEMMA = "join"  # hebben: TIME with a vc sibling, else HEAD

VERB_CLASSES = ["PASSIVE", "COPULA", "TIME", "MODAL", "HEAD"]


def _sc_expr() -> F.Column:
    """Synthetic Alpino `sc` attribute for verb nodes."""
    return F.when(
        (F.col("tag") == "WW") & (F.col("tok_i") % 4 == 0), "passive"
    ).otherwise("normal")


SQL_SC = "CASE WHEN tag = 'WW' AND tok_i % 4 = 0 THEN 'passive' ELSE 'normal' END"


def verb_features(
    spark: SparkSession, sf_dir: str, nodes: DataFrame | None = None
) -> DataFrame:
    """W29/W28 sentence battery: per-class verb counts + imperative flag.

    Plan: one aggregation of the node table by (doc, sent, parent) to
    compute sibling-relation presence, joined back on the same sentence
    key (co-partitioned — one shuffle, bounded groups), then the lemma/
    sibling classification cascade as pure codegen CASE logic, and one
    final sentence-grain aggregate.
    """
    from tscan_spark import annotate

    if nodes is None:
        nodes = parse_nodes(spark, sf_dir)
    nodes = nodes.withColumn("sc", _sc_expr())
    nodes = nodes.withColumn("lemma", annotate.lemma_expr(F.col("word")))
    sib = nodes.groupBy("doc_id", "sent_idx", "parent").agg(
        F.sum(F.when(F.col("rel") == "su", 1).otherwise(0)).alias("_su_cnt"),
        F.sum(F.when(F.col("rel") == "predm", 1).otherwise(0)).alias("_predm_cnt"),
        F.sum(F.when(F.col("rel") == "vc", 1).otherwise(0)).alias("_vc_cnt"),
    )
    j = nodes.join(sib, ["doc_id", "sent_idx", "parent"])
    # sibling counts EXCLUDE the node itself
    has_su_sib = (F.col("_su_cnt") - F.when(F.col("rel") == "su", 1).otherwise(0)) > 0
    has_predm_sib = (
        F.col("_predm_cnt") - F.when(F.col("rel") == "predm", 1).otherwise(0)
    ) > 0
    has_vc_sib = (F.col("_vc_cnt") - F.when(F.col("rel") == "vc", 1).otherwise(0)) > 0
    lem = F.col("lemma")
    verb_class = F.when(
        F.col("tag") == "WW",
        F.when((lem == PASSIVE_AUX_LEMMA) & (F.col("sc") == "passive"), "PASSIVE")
        .when(lem.isin(KOPPEL_LEMMAS) & has_predm_sib, "COPULA")
        .when(lem == TIME_LEMMA, "TIME")
        .when(lem.isin(MODAL_LEMMAS), "MODAL")
        .when((lem == HEBBEN_LEMMA) & has_vc_sib, "TIME")
        .when(lem == HEBBEN_LEMMA, "HEAD")
        .when(lem == PASSIVE_AUX_LEMMA, "TIME")
        .otherwise("HEAD"),
    )
    j = j.withColumn("verb_class", verb_class)
    # W28: an smain node with no su/sup sibling -> imperative clause
    imp = (F.col("cat") == "smain") & ~has_su_sib
    per_cls = [
        F.sum(F.when(F.col("verb_class") == c, 1).otherwise(0))
        .cast("int")
        .alias(f"{c.lower()}_cnt")
        for c in VERB_CLASSES
    ]
    return j.groupBy("doc_id", "sent_idx").agg(
        *per_cls,
        F.max(imp.cast("int")).cast("int").alias("is_imperative"),
    ).withColumn("sent_idx", F.col("sent_idx").cast("int"))


def sql_verb_features() -> str:
    from tscan_spark import annotate

    per_cls = ",\n           ".join(
        f"CAST(SUM(CASE WHEN verb_class = '{c}' THEN 1 ELSE 0 END) AS INT)"
        f" AS {c.lower()}_cnt"
        for c in VERB_CLASSES
    )
    koppels = ", ".join(f"'{w}'" for w in KOPPEL_LEMMAS)
    modals = ", ".join(f"'{w}'" for w in MODAL_LEMMAS)
    return (
        "WITH "
        + corpus.SQL_TOK_CTE.strip()
        + ",\n"
        + SQL_SENT_TOK_CTE.strip()
        + ",\n"
        + _sql_nodes()
        + f""",
vnodes AS (
    SELECT nodes.*,
           {SQL_SC} AS sc,
           {annotate.sql_lemma("word")} AS lemma
    FROM nodes
),
sib AS (
    SELECT doc_id, sent_idx, parent,
           SUM(CASE WHEN rel = 'su' THEN 1 ELSE 0 END) AS su_cnt,
           SUM(CASE WHEN rel = 'predm' THEN 1 ELSE 0 END) AS predm_cnt,
           SUM(CASE WHEN rel = 'vc' THEN 1 ELSE 0 END) AS vc_cnt
    FROM vnodes
    GROUP BY doc_id, sent_idx, parent
),
vj AS (
    SELECT n.*,
           (s.su_cnt - CASE WHEN n.rel = 'su' THEN 1 ELSE 0 END) > 0 AS has_su_sib,
           (s.predm_cnt - CASE WHEN n.rel = 'predm' THEN 1 ELSE 0 END) > 0
               AS has_predm_sib,
           (s.vc_cnt - CASE WHEN n.rel = 'vc' THEN 1 ELSE 0 END) > 0 AS has_vc_sib
    FROM vnodes n
    JOIN sib s USING (doc_id, sent_idx, parent)
),
vcls AS (
    SELECT vj.*,
           CASE WHEN tag = 'WW' THEN
                CASE
                  WHEN lemma = '{PASSIVE_AUX_LEMMA}' AND sc = 'passive' THEN 'PASSIVE'
                  WHEN lemma IN ({koppels}) AND has_predm_sib THEN 'COPULA'
                  WHEN lemma = '{TIME_LEMMA}' THEN 'TIME'
                  WHEN lemma IN ({modals}) THEN 'MODAL'
                  WHEN lemma = '{HEBBEN_LEMMA}' AND has_vc_sib THEN 'TIME'
                  WHEN lemma = '{HEBBEN_LEMMA}' THEN 'HEAD'
                  WHEN lemma = '{PASSIVE_AUX_LEMMA}' THEN 'TIME'
                  ELSE 'HEAD'
                END
           END AS verb_class,
           CASE WHEN cat = 'smain' AND NOT has_su_sib THEN 1 ELSE 0 END AS imp
    FROM vj
)
SELECT doc_id,
       CAST(sent_idx AS INT) AS sent_idx,
       {per_cls},
       CAST(MAX(imp) AS INT) AS is_imperative
FROM vcls
GROUP BY doc_id, sent_idx"""
    )


# ---------------------------------------------------------------------------
# P1 widen: per-pair-type dependency distances (the AL_* table)
# ---------------------------------------------------------------------------
#
# The reference accumulates a multimap<DD_type,int> of distances for 17
# dependency pair types (Alpino.cxx:294-614; DD_type enum Alpino.h:45-48)
# and emits a mean per type (MMtoString, structstats.cxx:408-425 —
# header AL_sub_ww .. AL_ww_znwbwp, structstats.cxx:326-330). The analog
# classifies each arc by (parent tag = head pos, child fine_rel, child
# lcat) over the full-space node attributes:
#   verb head (WW): su/obj1/obj2/vc arcs; svp+lcat part; predc+lcat
#     np|ap; mod+lcat advp|ap|np; pp/cp phrase siblings (the reference
#     branches on the sibling's cat there — fine_rel carries the marker);
#   noun head (N, under np): det, vc;
#   prep head (VZ, under pp): obj1;
#   coordinator head (VG, crd analog): cnj;
#   comparative head (BW, cmp/comp analog): body.
# All 17 DD_types expressible; column names follow the reference header.
AL_PAIRS: list[tuple[str, str, str, str | None]] = [
    # (column, parent tag, child fine_rel, child lcat or None)
    ("al_sub_ww", "WW", "su", None),  # SUB_VERB
    ("al_ob_ww", "WW", "obj1", None),  # OBJ1_VERB
    ("al_indirob_ww", "WW", "obj2", None),  # OBJ2_VERB
    ("al_ww_vzg", "WW", "pp", None),  # VERB_PP
    ("al_lidw_znw", "N", "det", None),  # NOUN_DET
    ("al_vz_znw", "VZ", "obj1", None),  # PREP_OBJ1
    ("al_ww_wwvc", "WW", "vc", None),  # VERB_VC
    ("al_vg_wwbijzin", "BW", "body", None),  # COMP_BODY
    ("al_vg_conj", "VG", "cnj", None),  # CRD_CNJ
    ("al_vg_wwhoofdzin", "WW", "cp", None),  # VERB_COMP
    ("al_znw_bijzin", "N", "vc", None),  # NOUN_VC
    ("al_ww_schdw", "WW", "svp", "part"),  # VERB_SVP
    ("al_ww_znwpred", "WW", "predc", "np"),  # VERB_PREDC_N
    ("al_ww_bnwpred", "WW", "predc", "ap"),  # VERB_PREDC_A
    ("al_ww_bnwbwp", "WW", "mod", "ap"),  # VERB_MOD_A
    ("al_ww_bwbwp", "WW", "mod", "advp"),  # VERB_MOD_BW
    ("al_ww_znwbwp", "WW", "mod", "np"),  # VERB_NOUN
]


def dep_pair_distances(
    spark: SparkSession, sf_dir: str, nodes: DataFrame | None = None
) -> DataFrame:
    """Doc-grain mean dependency distance per DD pair type + pair counts
    (flat mean over the doc's arcs of that type, as the reference's
    MMtoString over the merged multimap), plus al_gem over all typed
    arcs. One co-partitioned self-join on the sentence key, then every
    (cnt, mean) column comes out of a single hash aggregate."""
    if nodes is None:
        nodes = parse_nodes(spark, sf_dir)
    par = nodes.select(
        F.col("doc_id").alias("p_doc"),
        F.col("sent_idx").alias("p_sent"),
        F.col("tok_i").alias("p_tok"),
        F.col("tag").alias("p_tag"),
    )
    j = nodes.join(
        par,
        (F.col("doc_id") == F.col("p_doc"))
        & (F.col("sent_idx") == F.col("p_sent"))
        & (F.col("parent") == F.col("p_tok"))
        & (F.col("tok_i") > 0),
        "inner",
    )
    return j.groupBy("doc_id").agg(*_dep_pair_aggs())


@lru_cache(maxsize=None)
def _dep_pair_aggs() -> tuple:
    """The 17-pair (cnt, mean) aggregate list, built once per process
    (constant Column trees; per-call rebuild was py4j round trips)."""
    dist = F.abs(F.col("tok_i") - F.col("parent")).cast("double")
    hits = []
    for name, ptag, rel, lcat in AL_PAIRS:
        hit = (F.col("p_tag") == ptag) & (F.col("fine_rel") == rel)
        if lcat is not None:
            hit = hit & (F.col("lcat") == lcat)
        hits.append((name, hit))
    aggs = []
    any_hit = None
    for name, hit in hits:
        n = F.sum(F.when(hit, 1).otherwise(0))
        aggs.append(n.cast("long").alias(f"{name}_cnt"))
        aggs.append(fp_mean(F.when(hit, dist), n).alias(name))
        any_hit = hit if any_hit is None else (any_hit | hit)
    n_all = F.sum(F.when(any_hit, 1).otherwise(0))
    aggs.append(fp_mean(F.when(any_hit, dist), n_all).alias("al_gem"))
    return tuple(aggs)


def sql_dep_pair_distances() -> str:
    def hit_sql(ptag: str, rel: str, lcat: str | None) -> str:
        h = f"p_tag = '{ptag}' AND fine_rel = '{rel}'"
        if lcat is not None:
            h += f" AND lcat = '{lcat}'"
        return h

    lines = []
    for name, ptag, rel, lcat in AL_PAIRS:
        hit = hit_sql(ptag, rel, lcat)
        n = f"SUM(CASE WHEN {hit} THEN 1 ELSE 0 END)"
        lines.append(f"CAST({n} AS BIGINT) AS {name}_cnt")
        lines.append(
            sql_fp_mean(
                f"CASE WHEN {hit} THEN CAST(ABS(tok_i - parent) AS DOUBLE) END", n
            )
            + f" AS {name}"
        )
    any_hit = "\n            OR ".join(
        f"({hit_sql(ptag, rel, lcat)})" for _, ptag, rel, lcat in AL_PAIRS
    )
    n_all = f"SUM(CASE WHEN {any_hit} THEN 1 ELSE 0 END)"
    lines.append(
        sql_fp_mean(
            f"CASE WHEN {any_hit} THEN CAST(ABS(tok_i - parent) AS DOUBLE) END",
            n_all,
        )
        + " AS al_gem"
    )
    cols = ",\n       ".join(lines)
    return (
        "WITH "
        + corpus.SQL_TOK_CTE.strip()
        + ",\n"
        + SQL_SENT_TOK_CTE.strip()
        + ",\n"
        + _sql_nodes()
        + f""",
jp AS (
    SELECT n.*, p.tag AS p_tag
    FROM nodes n
    JOIN nodes p
      ON p.doc_id = n.doc_id AND p.sent_idx = n.sent_idx
     AND p.tok_i = n.parent AND n.tok_i > 0
)
SELECT doc_id,
       {cols}
FROM jp
GROUP BY doc_id"""
    )


def nominalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W24 checkNominal, FULL rule (src/wordstats.cxx:61-138): the
    lexical arms (morpheme-suffix with plural strip + tail matches —
    annotate.nominal_lexical_expr) OR the Alpino variant — a verb node
    directly under an np parent (wordstats.cxx:127-137; the pipeline's
    is_nominal column carries only the lexical arms, matching the
    reference's behavior when no parse is available, --skip=a).

    Token grain output so each arm is independently checkable:
    (doc_id, sent_idx, tok_i, word, nominal_lex, nominal_parse,
    is_nominal). Plan: one co-partitioned self-join on the sentence key
    for the parent cat; the lexical arm is pure codegen.
    """
    from tscan_spark import annotate

    nodes = parse_nodes(spark, sf_dir)
    par = nodes.select(
        F.col("doc_id").alias("p_doc"),
        F.col("sent_idx").alias("p_sent"),
        F.col("tok_i").alias("p_tok"),
        F.col("cat").alias("p_cat"),
    )
    j = nodes.join(
        par,
        (F.col("doc_id") == F.col("p_doc"))
        & (F.col("sent_idx") == F.col("p_sent"))
        & (F.col("parent") == F.col("p_tok"))
        & (F.col("tok_i") > 0),
        "left",
    )
    lex = annotate.nominal_lexical_expr(F.col("word"), F.col("tag"))
    parse_arm = (F.col("tag") == "WW") & (F.col("p_cat") == "np")
    parse_arm = F.coalesce(parse_arm, F.lit(False))
    return j.select(
        "doc_id",
        F.col("sent_idx").cast("int").alias("sent_idx"),
        F.col("tok_i").cast("int").alias("tok_i"),
        "word",
        lex.cast("int").alias("nominal_lex"),
        parse_arm.cast("int").alias("nominal_parse"),
        (lex | parse_arm).cast("int").alias("is_nominal"),
    )


def sql_nominalization() -> str:
    from tscan_spark import annotate

    lex = annotate.sql_nominal_lexical("word", "tag")
    return (
        "WITH "
        + corpus.SQL_TOK_CTE.strip()
        + ",\n"
        + SQL_SENT_TOK_CTE.strip()
        + ",\n"
        + _sql_nodes()
        + f""",
nj AS (
    SELECT n.*, p.cat AS p_cat
    FROM nodes n
    LEFT JOIN nodes p
      ON p.doc_id = n.doc_id AND p.sent_idx = n.sent_idx
     AND p.tok_i = n.parent AND n.tok_i > 0
)
SELECT doc_id,
       CAST(sent_idx AS INT) AS sent_idx,
       CAST(tok_i AS INT) AS tok_i,
       word,
       CAST(CASE WHEN {lex} THEN 1 ELSE 0 END AS INT) AS nominal_lex,
       CAST(CASE WHEN tag = 'WW' AND p_cat = 'np' THEN 1 ELSE 0 END AS INT)
           AS nominal_parse,
       CAST(CASE WHEN ({lex}) OR (tag = 'WW' AND p_cat = 'np')
                 THEN 1 ELSE 0 END AS INT) AS is_nominal
FROM nj"""
    )


def verb_doc_summary(
    spark: SparkSession, sf_dir: str, nodes: DataFrame | None = None
) -> DataFrame:
    """Doc-grain W29/W28 merge: per-class verb counts + imperative
    sentence count (verbHeader/imperativeToCSV, structstats.cxx:
    1443-1480 — Lijdv_d and friends consume these sums)."""
    sent = verb_features(spark, sf_dir, nodes=nodes)
    return sent.groupBy("doc_id").agg(
        *[
            F.sum(f"{c.lower()}_cnt").cast("long").alias(f"{c.lower()}_cnt")
            for c in VERB_CLASSES
        ],
        F.sum("is_imperative").cast("long").alias("imperative_sent_cnt"),
        F.count(F.lit(1)).cast("long").alias("sent_cnt"),
    )


def sql_verb_doc_summary() -> str:
    sums = ",\n       ".join(
        f"CAST(SUM({c.lower()}_cnt) AS BIGINT) AS {c.lower()}_cnt"
        for c in VERB_CLASSES
    )
    return (
        "WITH vsent AS (\n"
        + sql_verb_features()
        + f"""
)
SELECT doc_id,
       {sums},
       CAST(SUM(is_imperative) AS BIGINT) AS imperative_sent_cnt,
       CAST(COUNT(*) AS BIGINT) AS sent_cnt
FROM vsent
GROUP BY doc_id"""
    )


# ---------------------------------------------------------------------------
# S3 parse-cache join + S11 write-back
# ---------------------------------------------------------------------------
#
# The reference caches Alpino parses per sentence on disk and, on rerun,
# loads the cached tree instead of re-parsing (tscan.cxx parse-cache
# handling around the Alpino service calls; tests pin *.example.alpino
# caches). Spark-native: a `parse_cache` table keyed (doc_id, sent_idx)
# holding the node arrays; the engine LEFT-joins the sentence grain
# against it, computes only the misses, and writes the missed parses
# back (the classic incremental-materialization pattern — the join is
# equi on the sentence key, co-partitioned with the node table, and the
# write-back is an append of the miss partition only).

CACHE_MOD = 3  # synthetic "previously parsed" rule: doc_id % 3 != 0


def cached_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic synthetic cache subset (stands in for the
    on-disk cache; a real deployment reads a parquet/Iceberg cache
    table keyed the same way)."""
    return sentence_parse_stats(spark, sf_dir).where(
        F.col("doc_id") % CACHE_MOD != 0
    )


def sentence_parse_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-sentence parse summary (node count + max arc distance) —
    the payload a cache would store alongside the node array."""
    nodes = parse_nodes(spark, sf_dir)
    dist = F.abs(F.col("tok_i") - F.col("parent"))
    return nodes.groupBy("doc_id", "sent_idx").agg(
        F.count(F.lit(1)).cast("int").alias("n_nodes"),
        F.max(F.when(F.col("tok_i") > 0, dist)).cast("int").alias("max_arc"),
    )


def parse_cache_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3: sentence grain LEFT-joined to the parse cache; misses are
    (re)computed; output marks provenance.

    Plan: both sides derive from the same sentence key — the join is a
    co-partitioned sort-merge/hash on (doc_id, sent_idx) with bounded
    groups; at scale the cache side is a parquet scan with partition
    pruning on the key range being processed.
    """
    all_sents = sentence_parse_stats(spark, sf_dir)
    cache = cached_sentences(spark, sf_dir).select(
        "doc_id",
        "sent_idx",
        F.col("n_nodes").alias("c_n_nodes"),
        F.col("max_arc").alias("c_max_arc"),
    )
    j = all_sents.join(cache, ["doc_id", "sent_idx"], "left")
    return j.select(
        "doc_id",
        F.col("sent_idx").cast("int").alias("sent_idx"),
        F.coalesce(F.col("c_n_nodes"), F.col("n_nodes")).cast("int").alias("n_nodes"),
        F.coalesce(F.col("c_max_arc"), F.col("max_arc")).cast("int").alias("max_arc"),
        F.col("c_n_nodes").isNotNull().cast("int").alias("from_cache"),
    )


def sql_parse_cache_join() -> str:
    return (
        "WITH "
        + corpus.SQL_TOK_CTE.strip()
        + ",\n"
        + SQL_SENT_TOK_CTE.strip()
        + ",\n"
        + _sql_nodes()
        + f""",
sstats AS (
    SELECT doc_id, sent_idx,
           CAST(COUNT(*) AS INT) AS n_nodes,
           CAST(MAX(CASE WHEN tok_i > 0 THEN ABS(tok_i - parent) END) AS INT)
               AS max_arc
    FROM nodes
    GROUP BY doc_id, sent_idx
)
SELECT doc_id,
       CAST(sent_idx AS INT) AS sent_idx,
       n_nodes, max_arc,
       CAST(CASE WHEN doc_id % {CACHE_MOD} <> 0 THEN 1 ELSE 0 END AS INT)
           AS from_cache
FROM sstats"""
    )


def write_back_misses(spark: SparkSession, sf_dir: str, cache_dir: str) -> int:
    """S11: append the cache-miss parses to the cache table (idempotent:
    rerunning after a completed write finds zero misses). Returns the
    number of sentences written."""
    existing = None
    try:
        existing = spark.read.parquet(cache_dir)
    except Exception:
        pass
    all_sents = sentence_parse_stats(spark, sf_dir)
    if existing is not None:
        misses = all_sents.join(
            existing.select("doc_id", "sent_idx"), ["doc_id", "sent_idx"], "left_anti"
        )
    else:
        misses = all_sents
    n = misses.count()
    if n:
        misses.write.mode("append").parquet(cache_dir)
    return n
