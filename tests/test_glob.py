"""Include/exclude glob semantics on path-like ids — the reference's
two-tier (full path, then basename) matching and include x exclude
precedence matrix, ported from /root/reference/tests/glob_pattern.rs and
src/scanner.rs:31-41."""

from dedup_ray.stages.keys import glob_keep_mask


def _kept(ids, include=(), exclude=()):
    mask = glob_keep_mask(list(ids), list(include), list(exclude))
    return [i for i, k in zip(ids, mask) if k]


def test_exclude_extension():  # glob_pattern.rs:8
    ids = ["a.txt", "b.txt", "c.log", "d.log"]
    assert _kept(ids, exclude=["*.log"]) == ["a.txt", "b.txt"]


def test_exclude_extension_basename_tier():
    # *.log must match nested files via the basename tier (scanner.rs:31-41)
    ids = ["x/y/c.log", "x/y/keep.txt"]
    assert _kept(ids, exclude=["*.log"]) == ["x/y/keep.txt"]


def test_exclude_directory_skips_entire_tree():  # glob_pattern.rs:40
    ids = ["x/dup1.txt", "backup/dup2.txt", "backup/deep/dup3.txt"]
    assert _kept(ids, exclude=["backup"]) == ["x/dup1.txt"]


def test_multiple_exclude_patterns():  # glob_pattern.rs:66
    ids = ["keep1.txt", "keep2.txt", "a.log", "b.tmp"]
    assert _kept(ids, exclude=["*.log", "*.tmp"]) == ["keep1.txt", "keep2.txt"]


def test_include_by_extension():  # glob_pattern.rs:236
    ids = ["a.txt", "b.txt", "other.log"]
    assert _kept(ids, include=["*.txt"]) == ["a.txt", "b.txt"]


def test_include_multiple_patterns():  # glob_pattern.rs:266
    ids = ["a.rs", "b.rs", "a.txt", "other.log"]
    assert _kept(ids, include=["*.rs", "*.txt"]) == ["a.rs", "b.rs", "a.txt"]


def test_include_and_exclude_combined():  # glob_pattern.rs:337 — exclude wins
    ids = ["keep.txt", "skip.txt", "other.log"]
    assert _kept(ids, include=["*.txt"], exclude=["skip.txt"]) == ["keep.txt"]


def test_include_with_exclude_directory():  # glob_pattern.rs:400
    ids = ["src/main.rs", "src/lib.rs", "vendor/dep.rs"]
    assert _kept(ids, include=["*.rs"], exclude=["vendor"]) == [
        "src/main.rs", "src/lib.rs"
    ]


def test_exclude_globstar_directory():
    # **/node_modules prunes wherever the dir sits (scanner.rs:59-84)
    ids = ["a/node_modules/dep.js", "node_modules/x.js", "src/app.js"]
    assert _kept(ids, exclude=["**/node_modules"]) == ["src/app.js"]


def test_literal_separator_star_does_not_cross_slash():
    # full-id tier: src/*.rs matches one level only
    ids = ["src/main.rs", "src/deep/x.rs", "main.rs"]
    assert _kept(ids, include=["src/*.rs"]) == ["src/main.rs"]


def test_question_mark_and_class():
    ids = ["f1.txt", "f22.txt", "fa.txt"]
    assert _kept(ids, include=["f?.txt"]) == ["f1.txt", "fa.txt"]
    assert _kept(ids, include=["f[0-9].txt"]) == ["f1.txt"]


def test_exclude_file_patterns_mix():  # glob_pattern.rs:431
    ids = ["main.rs", "lib.rs", "test_main.rs", "readme.txt",
           "node_modules/dep.rs"]
    kept = _kept(ids, include=["*.rs", "*.txt"],
                 exclude=["test_*.rs", "node_modules"])
    assert kept == ["main.rs", "lib.rs", "readme.txt"]


def test_negated_character_class():
    """Glob [!...] must translate to regex [^...] — the raw passthrough
    inverted the semantics (round-2 review finding, verified vs fnmatch)."""
    import fnmatch

    ids = ["f1.txt", "fa.txt", "f!.txt", "f^.txt"]
    for pat in ["f[!0-9].txt", "f[0-9].txt", "f[]!].txt", "f[!]a].txt"]:
        got = glob_keep_mask(ids, [pat], [])
        want = [fnmatch.fnmatchcase(i, pat) for i in ids]
        assert got == want, (pat, got, want)
