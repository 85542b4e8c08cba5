"""Fine-taxonomy battery (pipeline_sem): oracle parity + the nesting
invariants the reference's class containment implies (sem.cxx
isStrictNoun/isBroadNoun: every fine class is a subset of its coarse
class; participles are a subset of the non-finite verb population)."""

from pyspark.sql import functions as F

from tests.conftest import SF_DIR, assert_matches_oracle
from tscan_spark import pipeline_sem
from tscan_spark.registry import ORACLES, QUERIES


def test_sem_fine_matches_oracle(spark, oracle):
    df = QUERIES["tscan_sem_fine"](spark, SF_DIR)
    assert_matches_oracle(df, oracle, ORACLES["tscan_sem_fine"])


def _fine_counts(spark):
    """Raw per-doc fine-class counts (the pre-ratio aggregate)."""
    tok = pipeline_sem._grain(spark, SF_DIR)
    tag, sem = F.col("tag"), F.col("noun_sem")
    h_nw = pipeline_sem._salt_hash("#nw")
    noun_fine = F.when(
        (tag == "N") & (sem == "CONCRETE"),
        pipeline_sem._pick(h_nw, pipeline_sem.NOUN_FINE["CONCRETE"]),
    )
    part_form = F.when(
        F.col("verb_form") == "inf",
        pipeline_sem._pick(
            pipeline_sem._salt_hash("#part"), pipeline_sem.PART_FORMS
        ),
    )
    return tok.groupBy("doc_id").agg(
        *[
            F.sum(F.when(noun_fine == k, 1).otherwise(0)).alias(k)
            for k in pipeline_sem.NOUN_FINE["CONCRETE"]
        ],
        F.sum(
            F.when((tag == "N") & (sem == "CONCRETE"), 1).otherwise(0)
        ).alias("coarse_conc_nw"),
        F.sum(F.when(part_form.isin("vd", "od"), 1).otherwise(0)).alias(
            "participles"
        ),
        F.sum(F.when(F.col("verb_form") == "inf", 1).otherwise(0)).alias(
            "inf_pop"
        ),
    )


def test_fine_noun_classes_nest_under_coarse(spark):
    """sum(concrete fine-noun cells) == the established coarse
    concrete-noun count, per document — the hash refinement cannot leak
    across coarse classes."""
    agg = _fine_counts(spark)
    fine_sum = None
    for k in pipeline_sem.NOUN_FINE["CONCRETE"]:
        c = F.col(k)
        fine_sum = c if fine_sum is None else fine_sum + c
    bad = agg.where(fine_sum != F.col("coarse_conc_nw")).count()
    assert bad == 0


def test_participles_nest_under_nonfinite_verbs(spark):
    """vd/od participles are a refinement of the non-finite (inf)
    analog population — never more participles than inf-form verbs."""
    agg = _fine_counts(spark)
    assert agg.where(F.col("participles") > F.col("inf_pop")).count() == 0
    # and the refinement actually fires on this corpus
    assert agg.agg(F.sum("participles")).first()[0] > 0


def test_sem_fine_battery_in_profile(spark):
    """The profile carries the fine battery's cells (spot columns) and
    the F4 dz ratios."""
    cols = set(QUERIES["tscan_doc_profile"](spark, SF_DIR).columns)
    for c in [
        "plantdier_nw_p", "subj_bvnw_d", "actieww_p", "int_bvnw_d",
        "form_znw_d", "pv_frog_per_zin", "vd_bv_dz", "ovd_vrij_dz",
        "infin_compl_bep_per_zin",
    ]:
        assert c in cols, c
