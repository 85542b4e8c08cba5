#!/usr/bin/env python
"""Two-cluster-size scaling evidence (north rule: N -> 4N executors with
throughput scaling efficiency >= 0.8).

No real cluster exists in this sandbox, so the same job runs at two
local parallelism levels (local[N] and local[4N]) on identical input,
per the driver's protocol. The job is the flagship T-Scan document
ladder over a REP-times replicated corpus — compute-bound, so fixed
plan/JVM overheads don't mask the scaling (the per-query bench at
sf=0.1 is dominated by sub-second queries where setup time wins).

Usage: python bench_scaling.py [--n 8] [--rep 16] [--sf-dir ...]
Prints one JSON line and (with --update-md) rewrites BENCH.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))


def run_leg(cpus: int, rep: int, sf_dir: str) -> dict:
    """One measurement in a fresh JVM (separate process per leg)."""
    code = f"""
import json, time
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master('local[{cpus}]')
         .config('spark.sql.shuffle.partitions','{max(cpus, 8)}')
         .config('spark.ui.enabled','false')
         .config('spark.ui.showConsoleProgress','false')
         .config('spark.driver.memory','48g')
         # size input splits so the scan fans out past the core count at
         # BOTH legs (the replicated corpus is only ~0.5 GB; the default
         # 128 MB split would cap parallelism at ~4 tasks)
         .config('spark.sql.files.maxPartitionBytes', str(32 * 1024 * 1024))
         .getOrCreate())
spark.sparkContext.setLogLevel('ERROR')
from tscan_spark.session import tune
tune(spark)
from tscan_spark import annotate, corpus, lexicons, pipeline
from tscan_spark.functions.scalars import fp_sum

docs = corpus.load(spark, '{sf_dir}', 'documents')
reps = spark.range({rep}).select(F.col('id').alias('rep'))
big = (docs.crossJoin(reps)
          .withColumn('doc_id', F.col('doc_id') * {rep} + F.col('rep'))
          .drop('rep'))
big.write.mode('overwrite').parquet('/tmp/tscan_scaling_input')
big = spark.read.parquet('/tmp/tscan_scaling_input')
n_docs = big.count()

# warmup (codegen + parquet footer caches) on a slice
_ = annotate.annotate(corpus.tokens_long(big.limit(100))).count()

t0 = time.time()
tok = annotate.annotate(corpus.tokens_long(big))
wf = lexicons.with_band_flags(lexicons.word_freq(big))
wordf = tok.join(F.broadcast(wf), 'word', 'left')
gate = (F.col('is_content') == 1) & (F.col('is_stop') == 0)
wordf = wordf.withColumn('content_freq_log', F.when(gate, F.col('wf_freq_log')))
sent = pipeline._sentence_agg(wordf)
doc = sent.groupBy('doc_id').agg(
    *[F.sum(c).alias(c) for c in pipeline._SENT_SUM_COLS],
    F.count(F.lit(1)).alias('sent_cnt'))
rows = doc.count()
dt = time.time() - t0
print(json.dumps({{'cpus': {cpus}, 'n_docs': n_docs, 'rows': rows,
                   'sec': round(dt, 3),
                   'docs_per_sec': round(n_docs / dt, 2)}}))
"""
    out = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--rep", type=int, default=16)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--update-md", action="store_true")
    args = ap.parse_args()

    small = run_leg(args.n, args.rep, args.sf_dir)
    big = run_leg(args.n * 4, args.rep, args.sf_dir)
    eff = (small["sec"] / big["sec"]) / 4.0
    result = {
        "metric": "scaling_efficiency_Nx4N",
        "value": round(eff, 3),
        "unit": "ratio",
        "n_small": args.n,
        "n_big": args.n * 4,
        "small": small,
        "big": big,
        "sf": args.sf_dir.rstrip("/").split("sf")[-1],
        "rep": args.rep,
    }
    print(json.dumps(result))
    if args.update_md:
        with open(os.path.join(REPO, "BENCH.md"), "w") as f:
            f.write(
                f"""# BENCH — throughput & scaling evidence

## Scaling (north rule: N -> 4N, efficiency >= 0.8)

Same job (flagship T-Scan document ladder: tokenize -> annotate ->
broadcast frequency-lexicon join -> sentence fold -> document merge)
over an identical {args.rep}x-replicated sf{result["sf"]} corpus
({small["n_docs"]} documents), measured in fresh JVMs per leg.

| parallelism | wall sec | docs/sec |
|---|---|---|
| local[{args.n}] (N) | {small["sec"]} | {small["docs_per_sec"]} |
| local[{args.n * 4}] (4N) | {big["sec"]} | {big["docs_per_sec"]} |

**Scaling efficiency = (T_N / T_4N) / 4 = {round(eff, 3)}**

Raw: `{json.dumps(result)}`

## Per-query timings

See the driver-recorded `BENCH_r*.json` (produced by `bench.py` at
sf0.1 on local[32]) for the per-operator breakdown.
"""
            )


if __name__ == "__main__":
    main()
