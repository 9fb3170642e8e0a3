"""Dev-time tool: dump the reference's correction/dictionary DATA tables to JSON.

The per-turn text-equality contract (BASELINE.json north_rule) requires the
exact same dictionary contents as the reference (alfalaq12/OCR). This script
imports the reference modules read-only and serializes their data tables
(word sets, phrase->phrase maps, spelling rules) into
``ocr_spark/data/*.json``. Only DATA is extracted — all algorithm code in
ocr_spark is an original Spark-first implementation.

Run once at dev time:  python tools/extract_ref_data.py
Provenance (reference file:line):
  KAMUS_DOKUMEN + NAMA_INDONESIA   dictionary_corrector.py:28-196
  PHRASE_CORRECTIONS               dictionary_corrector.py:244-648
  MULTI_WORD_CORRECTIONS           dictionary_corrector.py:746-1129
  KATA_ASING / RULES_EJAAN / KATA_J_KE_Y  spelling_normalizer.py:16-51
"""
import json
import pathlib
import sys

REF = "/root/reference"
OUT = pathlib.Path(__file__).resolve().parent.parent / "ocr_spark" / "data"

sys.path.insert(0, REF)

from app.services import dictionary_corrector as dc  # noqa: E402
from app.services import spelling_normalizer as sn  # noqa: E402

OUT.mkdir(parents=True, exist_ok=True)

# KAMUS_DOKUMEN at import time already includes NAMA_INDONESIA
# (dictionary_corrector.py:196). Sorted for determinism; membership-only use.
payload = {
    # insertion order of the dict literals is load-bearing for tie-breaks in
    # the length-descending sort of multiword keys (sorted() is stable) —
    # JSON objects preserve order, json.load gives back insertion order.
    "kamus": sorted(dc.KAMUS_DOKUMEN),
    "phrase_corrections": dc.PHRASE_CORRECTIONS,
    "multi_word_corrections": dc.MULTI_WORD_CORRECTIONS,
    "foreign_words": sorted(sn.KATA_ASING),
    "spelling_rules": [list(r) for r in sn.RULES_EJAAN],
    "j_to_y": sn.KATA_J_KE_Y,
}

with open(OUT / "corrections.json", "w", encoding="utf-8") as f:
    json.dump(payload, f, ensure_ascii=False, indent=1)

print(
    f"kamus={len(payload['kamus'])} phrases={len(payload['phrase_corrections'])} "
    f"multiword={len(payload['multi_word_corrections'])} "
    f"foreign={len(payload['foreign_words'])} rules={len(payload['spelling_rules'])} "
    f"j2y={len(payload['j_to_y'])}"
)
