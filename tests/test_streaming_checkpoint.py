"""Structured Streaming surface + checkpoint/resume semantics."""

import shutil

import pytest

from tests.conftest import SF_DIR


def test_streaming_doc_features_matches_batch(spark, tmp_path):
    """availableNow drain of the streaming ladder == batch result."""
    from tscan_spark import corpus
    from tscan_spark.streaming import stream

    # file stream sources want a directory of files
    srcdir = tmp_path / "docs_stream"
    srcdir.mkdir()
    shutil.copy(f"{SF_DIR}/documents.parquet", srcdir / "part-0.parquet")
    sdf = stream.streaming_doc_features(spark, str(srcdir))
    q = (
        sdf.writeStream.format("memory")
        .queryName("sdocf")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.doc_id, r.source): (r.word_cnt, r.content_incl_cnt, r.neg_cnt, r.char_sum)
        for r in spark.sql("SELECT * FROM sdocf").collect()
    }
    batch = {
        (r.doc_id, r.source): (r.word_cnt, r.content_incl_cnt, r.neg_cnt, r.char_sum)
        for r in stream.doc_feature_transform(
            corpus.load(spark, SF_DIR, "documents")
        ).collect()
    }
    assert got == batch


def test_streaming_session_windows(spark, tmp_path):
    from tscan_spark.streaming import stream

    srcdir = tmp_path / "events_stream"
    srcdir.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", srcdir / "part-0.parquet")
    sdf = stream.streaming_session_counts(spark, str(srcdir))
    q = (
        sdf.writeStream.format("memory")
        .queryName("ssess")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM ssess").collect()
    assert len(rows) > 0
    # session windows never overlap per user and respect the gap
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r.start_us, r.end_us))
    for spans in by_user.values():
        spans.sort()
        for (s1, e1), (s2, _) in zip(spans, spans[1:]):
            assert s2 >= e1  # no overlap


def test_checkpoint_resume(spark, tmp_path):
    """Kill after 3 buckets -> resume completes only the remainder and
    the union equals the direct batch result."""
    from tscan_spark import corpus, pipeline
    from tscan_spark.operators import checkpoint

    df = pipeline.doc_features(spark, SF_DIR)
    out = str(tmp_path / "ckpt_out")

    class Boom(Exception):
        pass

    calls = []

    def crash_after_3(b):
        calls.append(b)
        if len(calls) == 3:
            raise Boom()

    with pytest.raises(Boom):
        checkpoint.run_checkpointed(df, out, on_bucket=crash_after_3)
    assert len(checkpoint.completed_buckets(out)) == 3

    m = checkpoint.run_checkpointed(df, out)
    assert m["buckets_skipped"] == 3
    assert m["buckets_run"] == checkpoint.DEFAULT_BUCKETS - 3

    got = checkpoint.read_checkpointed(spark, out)
    assert got.count() == df.count()
    lineage = checkpoint.job_lineage(out)
    assert len(lineage) == checkpoint.DEFAULT_BUCKETS
    assert sum(r["rows"] for r in lineage) == df.count()
    shutil.rmtree(out)


def test_stateful_running_totals(spark, tmp_path):
    """applyInPandasWithState carries per-source state across
    micro-batches: with maxFilesPerTrigger=1 each file is its own
    batch, and the final emitted totals equal the global batch truth."""
    import os

    from pyspark.sql import functions as F

    from tscan_spark import corpus
    from tscan_spark.streaming import stream

    src = str(tmp_path / "docs_in")
    os.makedirs(src, exist_ok=True)
    docs = corpus.load(spark, SF_DIR, "documents").limit(60)
    # three files -> three micro-batches
    for i in range(3):
        docs.where(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    out = stream.streaming_running_totals(spark, src)
    q = (
        out.writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_state"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql(
        "SELECT * FROM running_totals"
    ).collect()
    # the LAST row per source carries the running totals; compare the
    # max per source against the batch ground truth
    got = {}
    for r in rows:
        cur = got.get(r.source)
        if cur is None or r.doc_cnt > cur[0]:
            got[r.source] = (r.doc_cnt, r.tok_cnt, r.vocab_size)
    tok = corpus.tokens_long(docs)
    exp = {
        r.source: (r.d, r.t, r.v)
        for r in tok.groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("d"),
            F.count(F.lit(1)).alias("t"),
            F.countDistinct("word").alias("v"),
        )
        .collect()
    }
    assert got == exp
    # and state genuinely accumulated across >1 micro-batch
    assert len(rows) > len(exp)


def test_streaming_dedup_ingest(spark, tmp_path):
    """Re-delivered files are dropped by the watermarked dedup: each
    content hash survives exactly once even when the same parquet file
    arrives twice, and the survivor set equals the batch-side distinct
    content-hash count."""
    from tscan_spark import corpus
    from pyspark.sql import functions as F
    from tscan_spark.streaming import stream

    srcdir = tmp_path / "docs_dedup_stream"
    srcdir.mkdir()
    shutil.copy(f"{SF_DIR}/documents.parquet", srcdir / "part-0.parquet")
    shutil.copy(f"{SF_DIR}/documents.parquet", srcdir / "part-1.parquet")
    sdf = stream.streaming_dedup_ingest(spark, str(srcdir))
    q = (
        sdf.writeStream.format("memory")
        .queryName("sdedup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM sdedup").collect()
    ids = [r.content_id for r in rows]
    assert len(ids) == len(set(ids)) > 0
    batch_distinct = (
        corpus.load(spark, SF_DIR, "documents")
        .select(corpus.content_hash_expr("text").alias("cid"))
        .distinct()
        .count()
    )
    assert len(ids) == batch_distinct


def test_streaming_snapshot_commits_incremental(spark, tmp_path):
    """A file stream over the snapshot table's data directory consumes
    each commit's delta exactly once across availableNow drains — the
    streaming counterpart of incremental materialization (the stream
    checkpoint is the high-water mark instead of the derived manifest
    chain)."""
    from pyspark.sql import functions as F

    from tscan_spark import corpus
    from tscan_spark.sources import snapshots

    table = str(tmp_path / "snaptab")
    docs = corpus.load(spark, SF_DIR, "documents")
    snapshots.append_snapshot(docs.where(F.col("doc_id") % 3 == 0), table, 1.0)
    snapshots.append_snapshot(docs.where(F.col("doc_id") % 3 == 1), table, 2.0)

    datadir = f"{table}/data"
    ckpt = str(tmp_path / "ckpt")

    def drain(name: str) -> None:
        sdf = (
            spark.readStream.schema(docs.schema)
            .option("recursiveFileLookup", "true")
            .parquet(datadir)
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"))
        )
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain("snapstream1")
    n1 = spark.sql("SELECT SUM(n_docs) AS n FROM snapstream1").first()["n"]
    assert n1 == docs.where(F.col("doc_id") % 3 != 2).count()

    # a third commit lands; the resumed stream (same checkpoint) picks
    # up exactly the new delta, converging on the full table
    snapshots.append_snapshot(docs.where(F.col("doc_id") % 3 == 2), table, 3.0)
    drain("snapstream2")
    n2 = spark.sql("SELECT SUM(n_docs) AS n FROM snapstream2").first()["n"]
    assert n2 == docs.count()


def test_staged_profile_checkpointed_resume(spark, tmp_path):
    """End-to-end reliable-checkpoint story (round-4 advice #9): the
    staged doc profile — grains materialized to a staging dir, the
    production shape — is computed bucket-by-bucket by run_checkpointed,
    killed mid-job, and resumed from the SAME lineage ledger: the resume
    runs only the remaining buckets, the union equals the direct result,
    and every lineage record carries its bucket metadata."""
    from tscan_spark.operators import checkpoint
    from tscan_spark.registry import QUERIES

    staging = str(tmp_path / "staging")
    out = str(tmp_path / "profile_out")
    df = QUERIES["tscan_doc_profile_staged"](spark, SF_DIR)

    class Boom(Exception):
        pass

    calls = []

    def crash_after_2(b):
        calls.append(b)
        if len(calls) == 2:
            raise Boom()

    with pytest.raises(Boom):
        checkpoint.run_checkpointed(df, out, n_buckets=4, on_bucket=crash_after_2)
    assert len(checkpoint.completed_buckets(out)) == 2

    m = checkpoint.run_checkpointed(df, out, n_buckets=4)
    assert m["buckets_skipped"] == 2 and m["buckets_run"] == 2

    got = checkpoint.read_checkpointed(spark, out)
    assert got.count() == df.count()
    assert sorted(got.columns) == sorted(df.columns)
    lineage = checkpoint.job_lineage(out)
    assert len(lineage) == 4
    for rec in lineage:
        assert rec["rows"] >= 0 and rec["key_col"] == "doc_id"
        assert rec["n_buckets"] == 4 and "wall_sec" in rec


def test_cc_reliable_checkpoint_path(spark, tmp_path, monkeypatch):
    """dedup_clusters' per-round lineage truncation runs through
    reliable checkpoint(dir) when TSCAN_CC_CHECKPOINT_DIR is set — the
    executor-loss-safe production path — and produces the identical
    cluster assignment; the checkpoint dir actually holds RDD state."""
    import os

    from tscan_spark.operators import dedup
    from tscan_spark.registry import QUERIES

    base = {
        (r.doc_id, r.cluster_id)
        for r in QUERIES["dedup_clusters"](spark, SF_DIR).collect()
    }
    ckpt = str(tmp_path / "cc_ckpt")
    monkeypatch.setenv("TSCAN_CC_CHECKPOINT_DIR", ckpt)
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "doc_a long, doc_b long"
    )
    labels, rounds = dedup._cc_two_phase(chain)
    assert {r.node: r.label for r in labels.collect()} == {i: 0 for i in range(64)}
    # reliable-checkpoint state was actually written
    assert os.path.isdir(ckpt) and any(os.scandir(ckpt))
    # the full operator through the reliable path = the local-path result
    reliable = {
        (r.doc_id, r.cluster_id)
        for r in QUERIES["dedup_clusters"](spark, SF_DIR).collect()
    }
    assert reliable == base
