"""Train the vendored mini-BPE merges table.

Trains on the synthetic sf0.01 documents corpus (driver-generated public
test data — no external vocabulary) and writes
``ocr_spark/data/bpe_merges.txt``. Deterministic: same corpus + same
n_merges => byte-identical table.

  python tools/train_bpe.py [--sf /root/testdata/sf0.01] [--merges 200]
"""
from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from ocr_spark.functions.bpe import BPE, train_bpe  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--merges", type=int, default=200)
    ap.add_argument(
        "--out",
        default=str(
            pathlib.Path(__file__).resolve().parent.parent
            / "ocr_spark" / "data" / "bpe_merges.txt"
        ),
    )
    args = ap.parse_args()

    import pyarrow.parquet as pq

    texts = (
        pq.read_table(f"{args.sf}/documents.parquet", columns=["text"])
        .column("text")
        .to_pylist()
    )
    merges = train_bpe(texts, n_merges=args.merges)
    bpe = BPE(merges)
    header = (
        f"# mini-BPE merges: trained by tools/train_bpe.py on the synthetic\n"
        f"# documents corpus at {args.sf} ({len(texts)} docs), "
        f"{len(merges)} merges.\n"
    )
    pathlib.Path(args.out).write_text(header + bpe.dumps())
    sample = texts[0][:80]
    print(f"wrote {len(merges)} merges to {args.out}")
    print(f"sample: {sample!r} -> {bpe.count(sample)} tokens")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
