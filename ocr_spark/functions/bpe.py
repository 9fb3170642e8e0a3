"""Deterministic mini-BPE: train / encode / count.

Replaces the ``ceil(chars/4)`` token-budget stand-in with a real byte-pair
encoding (the standard greedy merge algorithm of Sennrich et al. 2016,
re-implemented from the published description): X3 token counting becomes
an exact budget tool instead of a rule of thumb.

Everything is deterministic: training breaks frequency ties
lexicographically, and encoding applies merges by rank (lowest-rank pair
first, leftmost occurrence first — the published GPT-2 BPE application
order), so the same merges table yields the same token count on every
engine, partition, and run.

The vendored merges table ``ocr_spark/data/bpe_merges.txt`` is trained by
``tools/train_bpe.py`` on the synthetic sf0.01 documents corpus (public,
driver-generated) — no external vocabulary. Loaded via importlib.resources
so it works from a ``--py-files`` zip.
"""
from __future__ import annotations

import functools
from collections import Counter
from collections.abc import Iterable

#: end-of-word marker (kept distinct from any real character)
EOW = "</w>"


def _word_symbols(word: str) -> tuple[str, ...]:
    return tuple(word) + (EOW,)


def _pair_counts(vocab: dict[tuple[str, ...], int]) -> Counter:
    pairs: Counter = Counter()
    for symbols, n in vocab.items():
        for a, b in zip(symbols, symbols[1:]):
            pairs[(a, b)] += n
    return pairs


def _merge_vocab(
    vocab: dict[tuple[str, ...], int], pair: tuple[str, str]
) -> dict[tuple[str, ...], int]:
    a, b = pair
    merged = a + b
    out: dict[tuple[str, ...], int] = {}
    for symbols, n in vocab.items():
        new: list[str] = []
        i = 0
        while i < len(symbols):
            if i + 1 < len(symbols) and symbols[i] == a and symbols[i + 1] == b:
                new.append(merged)
                i += 2
            else:
                new.append(symbols[i])
                i += 1
        out[tuple(new)] = out.get(tuple(new), 0) + n
    return out


def train_bpe(texts: Iterable[str], n_merges: int = 200) -> list[tuple[str, str]]:
    """Greedy BPE training: repeatedly merge the most frequent adjacent
    symbol pair (ties broken by lexicographic pair order — deterministic)
    over the whitespace-token vocabulary. Returns the ordered merges."""
    words: Counter = Counter()
    for t in texts:
        if t:
            words.update(t.split())
    vocab = {_word_symbols(w): n for w, n in words.items()}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = _pair_counts(vocab)
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        vocab = _merge_vocab(vocab, best)
    return merges


def encode_word(
    word: str, ranks: dict[tuple[str, str], int]
) -> tuple[str, ...]:
    """Apply merges by rank until no mergeable pair remains."""
    symbols = list(_word_symbols(word))
    while len(symbols) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(symbols, symbols[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        symbols[best_i : best_i + 2] = [symbols[best_i] + symbols[best_i + 1]]
    return tuple(symbols)


class BPE:
    """Encoder over a trained merges list. ``count`` memoizes per word type
    — corpora are Zipfian, so steady-state counting is a dict hit."""

    def __init__(self, merges: list[tuple[str, str]]):
        self.merges = list(merges)
        self.ranks = {pair: i for i, pair in enumerate(self.merges)}
        self._count_word = functools.lru_cache(maxsize=1 << 16)(
            lambda w: len(encode_word(w, self.ranks))
        )

    def encode(self, text: str | None) -> list[str]:
        if not text:
            return []
        out: list[str] = []
        for w in text.split():
            out.extend(encode_word(w, self.ranks))
        return out

    def count(self, text: str | None) -> int:
        if not text:
            return 0
        return sum(self._count_word(w) for w in text.split())

    def dumps(self) -> str:
        lines = [f"{a}\t{b}" for a, b in self.merges]
        return "\n".join(lines) + "\n"

    @classmethod
    def loads(cls, data: str) -> "BPE":
        merges = []
        for line in data.splitlines():
            # merge lines always contain exactly one tab; header/comment
            # lines never do — keying on the tab (not a '#' prefix) keeps
            # merges whose first symbol IS '#' (e.g. learned from
            # '#include') from being dropped on round-trip
            if "\t" not in line:
                continue
            a, b = line.split("\t")
            merges.append((a, b))
        return cls(merges)


@functools.lru_cache(maxsize=1)
def vendored() -> BPE:
    """The committed merges table (zip-safe package-data load)."""
    from importlib.resources import files

    data = files("ocr_spark.data").joinpath("bpe_merges.txt").read_text()
    return BPE.loads(data)
