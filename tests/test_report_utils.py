"""Formatting/parsing scalar functions (~ reference src/util.rs golden tests)
and unreadable-row handling."""

import numpy as np
import pyarrow as pa

from dedup_ray.stages.keys import compute_exact_keys
from dedup_ray.stages.report import format_bytes, format_number, parse_size


def test_format_number_spaces():
    assert format_number(1234567) == "1 234 567"
    assert format_number(7) == "7"


def test_format_bytes_units():
    assert format_bytes(512) == "512 B"
    assert format_bytes(2048) == "2.00 KB"
    assert format_bytes(5 * 1024**2) == "5.00 MB"
    assert format_bytes(3 * 1024**3) == "3.00 GB"


def test_parse_size():
    assert parse_size("500M") == 500 * 1024**2
    assert parse_size("2G") == 2 * 1024**3
    assert parse_size("123") == 123
    assert parse_size("1.5k") == 1536


def test_unreadable_and_mismatched_rows_dropped():
    from dedup_ray.functions import codecs

    good = codecs.encode(np.zeros((4, 5, 3), dtype=np.uint8), "raw")
    batch = pa.table(
        {
            "image_id": pa.array(["a", "b", "c"]),
            "bytes": pa.array([good, b"garbage", good], type=pa.binary()),
            "w": pa.array([5, 5, 99], type=pa.int32()),  # c: declared w wrong
            "h": pa.array([4, 4, 4], type=pa.int32()),
            "fmt": pa.array(["raw", "raw", "raw"]),
            "caption": pa.array(["x", "y", "z"]),
            "phash": pa.array([1, 2, 3], type=pa.int64()),
        }
    )
    out = compute_exact_keys(batch)
    assert out["image_id"].to_pylist() == ["a"]
