"""tscan_spark — a PySpark-native feature-engineering engine.

A from-scratch reimplementation of the *computations* of T-Scan
(CentreForDigitalHumanities/tscan, reference at /root/reference) as an
idiomatic Spark DataFrame pipeline:

- per-token lexicon features via broadcast hash joins
  (reference: ``wordStats`` ctor, src/tscan.cxx:1669-1802),
- word -> sentence -> paragraph -> document aggregation ladders
  (reference: ``structStats::merge``, src/structstats.cxx:1374-1695),
- order-sensitive folds (MTLD, greedy multi-word matchers) as
  Arrow-vectorized ``applyInPandas`` kernels,
- cross-sentence lag/sliding-buffer overlap operators as Window specs,
- point-in-time (as-of) lexicon-snapshot joins with zero temporal
  leakage, gap sessionization and backfill,
- plus the large-scale training-data-pipeline operators a 100 TB corpus
  needs: exact/MinHash-LSH/SimHash dedup, embedding similarity search,
  language id, quality scoring, fingerprinting.

Everything is DataFrame-first: Catalyst handles pruning/pushdown, all
dimension joins are broadcast, all Python code is Arrow-batched.
"""

__version__ = "0.1.0"
