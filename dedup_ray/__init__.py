"""dedup_ray — a Ray-Data-native near-duplicate detection & clustering engine.

A from-scratch re-realization of the capabilities of the reference duplicate
finder (``denizariyan/dedup``, see /root/reference) generalized to tables of
image+caption pairs: a multi-stage candidate-pruning cascade (exact hashing →
MinHash/SimHash LSH → substring verification) ending in union-find clustering,
expressed entirely as ``ray.data.Dataset`` pipelines.

Layout:
    functions/   pure, deterministic kernels (codecs, hashes, sketches)
    sources/     corpus generator + table IO seam (lance|parquet)
    stages/      Dataset -> Dataset operators (exact tier, signatures, LSH,
                 verify, union-find clustering, report)
    pipelines/   end-to-end compositions (flagship near-dup, text dedup,
                 ANN, text analysis, relational demos)
    state/       per-partition checkpoint manifest + resume
    oracle/      single-process reference implementation (recall oracle)

Nothing in this package calls ``ray.init``/``ray.shutdown`` — sessions are
owned by the caller (driver, bench.py, or the pytest fixture).
"""

from dedup_ray.config import DedupConfig

__all__ = ["DedupConfig"]
__version__ = "0.1.0"
