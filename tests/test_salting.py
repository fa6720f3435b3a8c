"""Hot-bucket salting (north-rule): an adversarial over-cap LSH bucket must
yield the EXACT brute-force pair set with salting on, vs the lossy
star+chain degradation with salting off."""

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from dedup_ray.config import DedupConfig
from dedup_ray.stages.lsh import lsh_candidates

N = 60  # one bucket of 60 rows, cap 20 -> adversarial


def _hot_signatures(num_perm: int) -> rd.Dataset:
    rng = np.random.default_rng(3)
    ids = [f"img_{i:04d}" for i in range(N)]
    sig = rng.integers(0, 2**63, num_perm, dtype=np.int64)
    flat = np.tile(sig, N)
    sig_col = pa.FixedSizeListArray.from_arrays(pa.array(flat, type=pa.int64()), num_perm)
    t = pa.table(
        {
            "image_id": pa.array(ids, type=pa.string()),
            "minhash_sig": sig_col,
            "has_sig": pa.array([True] * N),
            "phash": pa.array(rng.integers(0, 2**63, N, dtype=np.int64), type=pa.int64()),
            "caption": pa.array(["short"] * N, type=pa.string()),
            "winnow_fp": pa.LargeListArray.from_arrays(
                pa.array(np.zeros(N + 1, dtype=np.int64)),
                pa.array([], type=pa.int64()),
            ),
        }
    )
    return rd.from_arrow(t).repartition(4)


def _pairs(cfg: DedupConfig) -> set:
    cand = lsh_candidates(_hot_signatures(cfg.num_perm), cfg)
    out = set()
    for tbl in ray.get(cand.to_arrow_refs()):
        if tbl.num_rows and "src_id" in tbl.column_names:
            out.update(zip(tbl["src_id"].to_pylist(), tbl["dst_id"].to_pylist()))
    return out


def test_salting_preserves_exact_pair_set():
    ids = sorted(f"img_{i:04d}" for i in range(N))
    full = {(ids[i], ids[j]) for i in range(N) for j in range(i + 1, N)}
    salted = _pairs(DedupConfig(bucket_pair_cap=20, salt_hot_buckets=True))
    assert salted == full

    capped = _pairs(DedupConfig(bucket_pair_cap=20, salt_hot_buckets=False))
    assert capped < full  # the degradation salting replaces
