"""Byte-pair-encoding tokenizer kernels (Sennrich et al. 2016, ACL —
"Neural Machine Translation of Rare Words with Subword Units").

The training-data-pipeline staple the token-counting operators approximate:
learn a subword vocabulary from corpus statistics, then segment every
document with it. Train is driver-side over a BOUNDED word-frequency table
(the distributed pipeline caps it to the top-V words — standard practice:
BPE statistics saturate long before the vocabulary tail); encode is a pure
per-word function, cached per actor, applied distributed.

Both halves share one segmentation scheme: word -> list of single
characters + a terminal end-of-word symbol, merges applied greedily in
rank order. ``encode_word`` reproduces training's final segmentation for
every trained word (the lowest-rank-present-first loop replays merges in
the same global order).
"""

from __future__ import annotations

EOW = "</w>"


def _merge_word(
    sym: tuple[str, ...], a: str, b: str, ab: str
) -> tuple[str, ...]:
    """Replace every non-overlapping (a, b) bigram with ab, left to right."""
    out: list[str] = []
    i, n = 0, len(sym)
    while i < n:
        if i < n - 1 and sym[i] == a and sym[i + 1] == b:
            out.append(ab)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def train_bpe(
    word_freqs: dict[str, int], n_merges: int
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` merge rules from a word-frequency table.

    Deterministic: the best pair is (max count, lexicographically smallest)
    — no dict-order dependence. Incremental pair-count maintenance (only
    words containing the merged pair are reprocessed), so cost is
    O(n_merges x affected-words), not O(n_merges x vocabulary).
    """
    words: list[tuple[str, ...]] = []
    freqs: list[int] = []
    for w, f in word_freqs.items():
        if w:
            words.append(tuple(w) + (EOW,))
            freqs.append(int(f))

    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wi, (sym, f) in enumerate(zip(words, freqs)):
        for p in zip(sym, sym[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + f
            pair_words.setdefault(p, set()).add(wi)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        mx = max(pair_counts.values())
        if mx <= 0:
            break
        best = min(p for p, c in pair_counts.items() if c == mx)
        merges.append(best)
        ab = best[0] + best[1]
        # pair_words accumulates stale members as words mutate; filter by
        # actually containing the pair right now
        touched = [
            wi
            for wi in pair_words.pop(best, ())
            if any(
                words[wi][i : i + 2] == best
                for i in range(len(words[wi]) - 1)
            )
        ]
        for wi in touched:
            old, f = words[wi], freqs[wi]
            for p in zip(old, old[1:]):
                c = pair_counts.get(p)
                if c is not None:
                    if c - f <= 0:
                        pair_counts.pop(p, None)
                    else:
                        pair_counts[p] = c - f
            new = _merge_word(old, best[0], best[1], ab)
            words[wi] = new
            for p in zip(new, new[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + f
                pair_words.setdefault(p, set()).add(wi)
        pair_counts.pop(best, None)
    return merges


def encode_word(
    word: str,
    ranks: dict[tuple[str, str], int],
    cache: dict[str, tuple[str, ...]] | None = None,
) -> tuple[str, ...]:
    """Segment one word with trained merge ranks (lowest rank first, all
    occurrences at once — the exact training order). ``cache`` amortizes
    repeated words to a dict hit; under Zipf that is nearly every word."""
    if cache is not None:
        hit = cache.get(word)
        if hit is not None:
            return hit
    sym: tuple[str, ...] = tuple(word) + (EOW,)
    while len(sym) > 1:
        best_rank = None
        best: tuple[str, str] | None = None
        for p in zip(sym, sym[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best = r, p
        if best is None:
            break
        sym = _merge_word(sym, best[0], best[1], best[0] + best[1])
    if cache is not None:
        cache[word] = sym
    return sym


def train_bpe_naive(
    word_freqs: dict[str, int], n_merges: int
) -> list[tuple[str, str]]:
    """Recount-from-scratch reference trainer (test oracle for the
    incremental one): identical selection rule, O(n_merges x vocabulary)."""
    vocab = {
        tuple(w) + (EOW,): int(f) for w, f in word_freqs.items() if w
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for sym, f in vocab.items():
            for p in zip(sym, sym[1:]):
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        mx = max(counts.values())
        best = min(p for p, c in counts.items() if c == mx)
        merges.append(best)
        vocab = {
            _merge_word(s, best[0], best[1], best[0] + best[1]): f
            for s, f in vocab.items()
        }
    return merges
