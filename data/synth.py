"""Deterministic transcript-table synthesizer (FIXTURES.md §1).

Builds the (conv_id, turn_idx, role, text, tool, ts) table the north rule's
input_hint specifies, at parameterized scale, fully seeded. Text mixes real
OCR previews from the reference's shipped history DB (captured in the golden
fixture corpus), noisy-OCR synthetics exercising every pipeline branch, and
clean filler — plus empty / whitespace-only / very long turns. Rows are
written SHUFFLED so stable (conv_id, turn_idx) ordering is actually
exercised downstream.

Usage:
  python data/synth.py OUT_DIR --convs 1000 --mean-turns 10 [--skew-convs 5 --skew-turns 100000]
"""
from __future__ import annotations

import argparse
import datetime
import json
import pathlib
import random

import pyarrow as pa
import pyarrow.parquet as pq

_FIXDIR = pathlib.Path(__file__).resolve().parent.parent / "tests" / "fixtures"

ROLES = ["user", "assistant", "tool"]
TOOLS = ["", "", "", "search", "bash", "ocr", "python"]

_FILLER = [
    "Berikut hasil pemindaian dokumen arsip nasional tahun anggaran berjalan.",
    "The quick brown fox jumps over the lazy dog near the old warehouse.",
    "Mohon periksa kembali lampiran surat keputusan tersebut dengan teliti.",
    "Processing completed without errors; see attached summary for details.",
    "Dokumen ini merupakan salinan sah dari arsip departemen yang bersangkutan.",
]


def _corpus() -> list[str]:
    """Distinct input texts from the golden fixture corpus (reference
    previews + branch synthetics) — guarantees every correction branch
    appears in synthesized data."""
    fixtures = json.loads((_FIXDIR / "golden.json").read_text())
    seen: dict[str, None] = {}
    for fx in fixtures:
        seen.setdefault(fx["input"], None)
    return [t for t in seen if t]


def make_rows(
    n_convs: int,
    mean_turns: int,
    seed: int = 42,
    skew_convs: int = 0,
    skew_turns: int = 0,
) -> list[dict]:
    rng = random.Random(seed)
    corpus = _corpus()
    epoch = datetime.datetime(2026, 1, 1, tzinfo=datetime.timezone.utc)
    rows: list[dict] = []

    def add_conv(conv_i: int, n_turns: int) -> None:
        conv_id = f"conv-{conv_i:08d}"
        conv_offset = rng.randrange(0, 86400 * 30)
        for turn_idx in range(n_turns):
            role = ROLES[turn_idx % 3]
            draw = rng.random()
            if draw < 0.45:
                text = rng.choice(corpus)
            elif draw < 0.85:
                text = " ".join(rng.choice(_FILLER) for _ in range(rng.randrange(1, 4)))
            elif draw < 0.90:
                text = ""  # empty turn
            elif draw < 0.93:
                text = "   \n\t  "  # whitespace-only
            elif draw < 0.96:
                # very long turn: repeated corpus fragments
                text = "\n\n".join(rng.choice(corpus) for _ in range(40))
            else:
                text = rng.choice(corpus) + " — ünïcode ✓ " + rng.choice(_FILLER)
            rows.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": turn_idx,
                    "role": role,
                    "text": text,
                    "tool": rng.choice(TOOLS) if role == "tool" else "",
                    "ts": epoch
                    + datetime.timedelta(seconds=conv_offset + turn_idx * 37),
                }
            )

    for i in range(n_convs):
        # turn counts: geometric-ish around the mean, >=1
        n_turns = max(1, int(rng.expovariate(1.0 / mean_turns)) + 1)
        add_conv(i, n_turns)
    for j in range(skew_convs):
        add_conv(n_convs + j, skew_turns)

    rng.shuffle(rows)
    return rows


SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us", tz="UTC")),
    ]
)


def write_table(out_dir: str, rows: list[dict], files: int = 8) -> None:
    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    cols = {name: [r[name] for r in rows] for name in SCHEMA.names}
    table = pa.table(cols, schema=SCHEMA)
    per = max(1, (table.num_rows + files - 1) // files)
    for k in range(files):
        chunk = table.slice(k * per, per)
        if chunk.num_rows:
            pq.write_table(chunk, out / f"part-{k:04d}.parquet")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--convs", type=int, default=1000)
    ap.add_argument("--mean-turns", type=int, default=10)
    ap.add_argument("--skew-convs", type=int, default=0)
    ap.add_argument("--skew-turns", type=int, default=0)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--files", type=int, default=8)
    args = ap.parse_args()
    rows = make_rows(
        args.convs, args.mean_turns, args.seed, args.skew_convs, args.skew_turns
    )
    write_table(args.out_dir, rows, args.files)
    print(f"wrote {len(rows)} turns to {args.out_dir}")


if __name__ == "__main__":
    main()
