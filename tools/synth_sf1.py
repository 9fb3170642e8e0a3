"""Synthesize the sf1 tier (10× sf0.1) for the dedup/curation family.

The driver ships sf0.001/sf0.01/sf0.1; the hot-key caps (_JACCARD_CAP =
1000 doc-freq, max_bucket_size = 1000) are inert at those sizes, so cap
semantics — oracle-MIRRORED capped-universe Jaccard, posting-size bucket
drops — were only ever exercised by unit tests. This tier is big enough
that the caps FIRE on real query runs: a boilerplate sentence is planted
in ~6% of documents (>1000 docs ⇒ its shingles leave the universe), and
a hot embedding direction floods one LSH bucket. Oracle equality must
STILL hold (`python tools/check_oracles.py --sf data/sf1 --only ...`)
because the SQL oracles reproduce the cap arithmetic; cap-drop counters
are reported by bench.py so the recall trade-off is observable, never
silent.

Deterministic (seed below), same schemas as the driver tiers:
  documents(doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR,
            n_chars BIGINT)           — 50,000 rows
  embeddings(vec_id BIGINT, embedding FLOAT[64], label INT) — 20,000 rows

Usage:  python tools/synth_sf1.py [outdir]   (default /root/repo/data/sf1)
"""
from __future__ import annotations

import pathlib
import random
import sys

import numpy as np
import pandas as pd

SEED = 421
N_DOCS = 50_000
N_VECS = 20_000
DIM = 64

_BASE = (
    "spark line column order small sort fast value scan stream hash table "
    "query agg batch part filter customer key group vector join shuffle "
    "plan stage task row page block index merge"
).split()
# ~2,000 distinct words: at 50k docs a 30-word vocabulary makes most
# documents share ONE distinct-token set (identical simhashes → quadratic
# fake clusters — measured blow-up); suffixing the base words widens the
# vocabulary to web-plausible breadth so only PLANTED duplicates collide.
# Suffixes must be ALPHABETIC — the suite's WORD_RE is [a-z]{3,}, so a
# digit suffix would tokenize right back to the 30 base words.
_SUFFIXES = [a + b for a in "abcdefgh" for b in "aeioukrst"][:66]
VOCAB = _BASE + [f"{w}{sfx}" for w in _BASE for sfx in _SUFFIXES]
LANGS = ["en", "en", "de", "zh", "fr", "es"]  # en-heavy like the driver tiers
BOILERPLATE = "subscribe to the newsletter for updates and offers today"


def make_documents(rng: random.Random) -> pd.DataFrame:
    rows = []
    texts: list[str] = []
    for i in range(N_DOCS):
        r = rng.random()
        # dup sources draw from the first 2,000 originals only: bounded
        # cluster sizes (~tens of pairs each, ~50k pairs corpus-wide) keep
        # the oracle sweep fast; unbounded preferential attachment grew
        # 100-member clusters and a ~1M-pair result (measured) without
        # testing anything the caps don't already cover
        pool = min(len(texts), 2_000)
        if i > 10 and r < 0.06:
            # exact duplicate of an earlier doc
            text = texts[rng.randrange(pool)]
        elif i > 10 and r < 0.16:
            # near-duplicate: copy an earlier doc, mutate 1-3 words
            words = texts[rng.randrange(pool)].split()
            for _ in range(rng.randrange(1, 4)):
                words[rng.randrange(len(words))] = rng.choice(VOCAB)
            text = " ".join(words)
        else:
            n = rng.randrange(8, 100)
            words = [rng.choice(VOCAB) for _ in range(n)]
            if r > 0.94:
                # boilerplate carrier: plants hot shingles in ~6% of docs
                # (3,000 ≫ the 1,000 doc-freq cap ⇒ the cap fires at sf1)
                at = rng.randrange(len(words) + 1)
                words[at:at] = BOILERPLATE.split()
            text = " ".join(words)
        texts.append(text)
        rows.append(
            (
                i,
                text,
                rng.choice(LANGS),
                f"src{rng.randrange(20)}",
                len(text),
            )
        )
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    return df.astype({"doc_id": "int64", "n_chars": "int64"})


def make_embeddings(rng: random.Random) -> pd.DataFrame:
    npr = np.random.RandomState(SEED)
    m = npr.randn(N_VECS, DIM).astype(np.float32)
    # hot direction: ~8% of vectors are tiny perturbations of one vector —
    # they all share an LSH bucket (fires max_bucket_size caps) and give
    # embedding_near_dup a dense planted cluster
    hot = npr.randn(DIM).astype(np.float32)
    hot_ids = npr.choice(N_VECS, size=N_VECS // 50, replace=False)
    m[hot_ids] = hot + 0.01 * npr.randn(len(hot_ids), DIM).astype(np.float32)
    # plus scattered near-dup pairs (scaled copies: cosine == 1)
    for i in range(0, 400, 2):
        m[i + 1] = m[i] * np.float32(1.5)
    return pd.DataFrame(
        {
            "vec_id": np.arange(N_VECS, dtype=np.int64),
            "embedding": [m[i] for i in range(N_VECS)],
            "label": (np.arange(N_VECS) % 10).astype(np.int32),
        }
    )


def main() -> int:
    out = pathlib.Path(sys.argv[1] if len(sys.argv) > 1 else "/root/repo/data/sf1")
    out.mkdir(parents=True, exist_ok=True)
    rng = random.Random(SEED)
    docs = make_documents(rng)
    docs.to_parquet(out / "documents.parquet", index=False)
    emb = make_embeddings(rng)
    emb.to_parquet(out / "embeddings.parquet", index=False)
    print(
        f"wrote {len(docs)} documents ({docs['text'].nunique()} distinct texts), "
        f"{len(emb)} embeddings to {out}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
