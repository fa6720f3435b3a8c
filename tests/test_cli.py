"""CLI behaviors (~ reference tests/exit_codes.rs, output_format.rs,
glob_pattern.rs — in-process against the session Ray)."""

import json
import os

import pytest

from dedup_ray.cli import build_parser, main, parse_glob_file


@pytest.fixture(scope="module")
def corpus(tiny_corpus):
    return os.path.join(tiny_corpus, "images.parquet")


def test_exit_code_flags(corpus, capsys):
    # duplicates exist -> exit 1 with --report-exit-code, 0 without
    assert main(["run", "--input", corpus, "--format", "quiet"]) == 0
    assert (
        main(["run", "--input", corpus, "--format", "quiet", "--report-exit-code"])
        == 1
    )


def test_quiet_is_empty(corpus, capsys):
    main(["run", "--input", corpus, "--format", "quiet"])
    assert capsys.readouterr().out == ""


def test_json_format_shape(corpus, capsys):
    main(["run", "--input", corpus, "--format", "json"])
    report = json.loads(capsys.readouterr().out)
    assert {"total_rows", "duplicate_rows", "duplicate_clusters", "wasted_bytes"} <= set(
        report["stats"]
    )


def test_human_format(corpus, capsys):
    main(["run", "--input", corpus])
    out = capsys.readouterr().out
    assert "Duplicate rows:" in out


def test_exclude_all_glob(corpus, capsys):
    rc = main(
        ["run", "--input", corpus, "--exclude", "img_*", "--report-exit-code",
         "--format", "quiet"]
    )
    assert rc == 0  # everything excluded -> no duplicates


def test_size_filter_flag(corpus):
    rc = main(
        ["run", "--input", corpus, "--min-size", str(10**9), "--report-exit-code",
         "--format", "quiet"]
    )
    assert rc == 0


def test_dry_run_apply(corpus, capsys, tmp_path):
    out = str(tmp_path / "clusters")
    rc = main(
        ["run", "--input", corpus, "--action", "keep-one", "--dry-run",
         "--format", "quiet", "--output", out]
    )
    assert rc == 0
    assert "[dry-run] would drop" in capsys.readouterr().err
    assert os.path.isdir(out)  # clusters parquet written


def test_decisions_table(corpus, tmp_path):
    dec = str(tmp_path / "decisions")
    main(
        ["run", "--input", corpus, "--action", "keep-one", "--decisions", dec,
         "--format", "quiet"]
    )
    import pyarrow.parquet as pq

    t = pq.read_table(dec)
    df = t.to_pandas()
    keeps = df[df.decision == "keep"]
    assert (keeps.image_id == keeps.cluster_id).all()
    # exactly one keeper per cluster
    assert keeps.cluster_id.is_unique


def test_parse_glob_file(tmp_path):
    p = tmp_path / "globs.txt"
    p.write_text("# comment\n\nimg_0*\n  img_1*  \n")
    assert parse_glob_file(str(p)) == ["img_0*", "img_1*"]
    assert parse_glob_file(str(tmp_path / "missing.txt")) == []


def test_parser_defaults():
    args = build_parser().parse_args(["run", "--input", "x"])
    assert args.format == "human" and args.action == "none"
    assert args.min_size == 0 and not args.report_exit_code


def test_incremental_mode_flags(corpus, tmp_path, capsys):
    """--prior-input/--prior-checkpoint route through the incremental
    pipeline; partial flags are a usage error."""
    assert main(["run", "--input", corpus, "--prior-input", corpus,
                 "--format", "quiet"]) == 2
    ck = str(tmp_path / "ck")
    assert main(["run", "--input", corpus, "--format", "quiet",
                 "--checkpoint", ck]) == 0
    # empty delta: reuse the corpus as its own (trivial) delta — the run
    # must succeed and report the union (= corpus twice would double-count
    # ids, so use a real empty delta instead)
    import pyarrow.parquet as pq

    t = pq.read_table(corpus).slice(0, 0)
    empty = str(tmp_path / "empty.parquet")
    pq.write_table(t, empty)
    rc = main(["run", "--input", empty, "--prior-input", corpus,
               "--prior-checkpoint", ck, "--format", "json"])
    assert rc == 0
    out = capsys.readouterr().out
    import json as _json

    rep = _json.loads(out)
    assert rep["stats"]["total_rows"] > 0
    # --checkpoint is meaningless in incremental mode: reject, don't ignore
    assert main(["run", "--input", empty, "--prior-input", corpus,
                 "--prior-checkpoint", ck, "--checkpoint",
                 str(tmp_path / "ck2"), "--format", "quiet"]) == 2


def test_cli_export_partitioned(tiny_corpus, tmp_path, capsys):
    import glob
    import os

    from dedup_ray.cli import main

    exp = str(tmp_path / "exp")
    rc = main(["run", "--input", os.path.join(tiny_corpus, "images.parquet"),
               "--format", "quiet", "--export", exp,
               "--export-partitions", "8"])
    assert rc == 0
    parts = glob.glob(exp + "/part=*/data.parquet")
    assert parts  # something was exported
    assert all(
        os.path.exists(os.path.join(os.path.dirname(p), "_SUCCESS"))
        for p in parts
    )
    # second run skips every partition
    rc = main(["run", "--input", os.path.join(tiny_corpus, "images.parquet"),
               "--format", "quiet", "--export", exp,
               "--export-partitions", "8"])
    assert rc == 0
    err = capsys.readouterr().err
    assert "0 partitions written" in err.splitlines()[-1]
