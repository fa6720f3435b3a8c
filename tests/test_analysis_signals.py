"""Quality-signal kernels: compression ratio and char entropy."""

import os

import numpy as np
import pandas as pd


def _write_docs(tmp_path, texts):
    pd.DataFrame(
        {
            "doc_id": pd.Series(range(1, len(texts) + 1), dtype="int64"),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": pd.Series([len(t) for t in texts], dtype="int64"),
        }
    ).to_parquet(os.path.join(str(tmp_path), "documents.parquet"))
    return str(tmp_path)


def test_compression_ratio_separates(tmp_path, ray_session):
    import zlib

    from dedup_ray.pipelines.analysis import compression_ratio

    rng = np.random.default_rng(5)
    rand = "".join(chr(c) for c in rng.integers(33, 127, 4000))
    rep = "spam ham " * 500
    sf = _write_docs(tmp_path, [rand, rep, ""])
    got = compression_ratio(sf).to_pandas().set_index("doc_id")
    # kernel replay
    assert got.loc[1, "n_compressed"] == len(zlib.compress(rand.encode(), 6))
    # separation: repetitive text compresses far better than random
    assert got.loc[2, "ratio"] < 0.1 < 0.5 < got.loc[1, "ratio"]
    assert got.loc[3, "ratio"] == 0.0 and got.loc[3, "n_bytes"] == 0


def test_char_entropy_extremes(tmp_path, ray_session):
    from dedup_ray.pipelines.analysis import char_entropy

    sf = _write_docs(tmp_path, ["aaaaaaaaaa", "abcdefgh", ""])
    got = char_entropy(sf).to_pandas().set_index("doc_id")
    assert got.loc[1, "entropy_bits"] == 0.0 and got.loc[1, "n_chars_used"] == 1
    assert abs(got.loc[2, "entropy_bits"] - 3.0) < 1e-12  # 8 equiprobable chars
    assert got.loc[3, "entropy_bits"] == 0.0 and got.loc[3, "n_chars_used"] == 0


def test_longest_repeated_substring_kernel():
    from dedup_ray.functions.suffix import longest_repeated_substring as lrs

    assert lrs("") == 0
    assert lrs("ab") == 0
    assert lrs("aa") == 1
    assert lrs("banana") == 3  # "ana"
    assert lrs("abcdefg") == 0
    # planted 20-char block repeated with junk between
    block = "THE-REPEATED-BLOCK-X"
    s = "left " + block + " middle junk " + block + " right"
    assert lrs(s) == len(block) + 2  # spaces flank both occurrences
    assert lrs(s, min_len=30) == 0  # floor above the answer


def test_self_repetition_operator(tmp_path, ray_session):
    from dedup_ray.pipelines.analysis import self_repetition

    block = "copy paste this exact sentence again. "
    texts = [block * 5, "all words here are distinct tokens entirely", ""]
    sf = _write_docs(tmp_path, texts)
    got = self_repetition(sf).to_pandas().set_index("doc_id")
    # block*5 repeats block*4 (offset by one block): length 4*len(block)
    assert got.loc[1, "max_repeat_len"] == 4 * len(block)
    assert got.loc[1, "repeat_ratio"] > 0.7
    assert got.loc[2, "max_repeat_len"] < 10  # below min_len -> 0
    assert got.loc[3, "max_repeat_len"] == 0
