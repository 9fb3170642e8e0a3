"""Dev-time tool: generate golden fixtures by running the REFERENCE pipeline.

Executes /root/reference's text pipeline (the exact call sequence of
routers/ocr.py:203-260) over the fixture corpus (FIXTURES.md §3) for all 4
flag combinations and records outputs into tests/fixtures/golden.json.
Pinned to the deterministic HAS_RAPIDFUZZ=False path (SURVEY.md §7.4).

Run once at dev time:  python tools/make_fixtures.py
"""
import json
import pathlib
import sqlite3
import sys

REF = "/root/reference"
OUT = pathlib.Path(__file__).resolve().parent.parent / "tests" / "fixtures"

sys.path.insert(0, REF)

from app.services.dictionary_corrector import (  # noqa: E402
    HAS_RAPIDFUZZ,
    correct_with_stats,
    get_unknown_words,
    normalize_currency_and_numbers,
)
from app.services.scoring_service import calculate_quality_score  # noqa: E402
from app.services.spelling_normalizer import normalize_with_comparison  # noqa: E402

assert not HAS_RAPIDFUZZ, "fixtures must pin the deterministic no-rapidfuzz path"


def reference_pipeline(text, use_dictionary, use_spelling, confidences):
    """Mirror routers/ocr.py:203-260 exactly."""
    corrected = text
    n_corr = 0
    if use_dictionary and text:
        corrected, n_corr = correct_with_stats(text)
        corrected = normalize_currency_and_numbers(corrected)
    if use_spelling and corrected:
        _, normalized, n_spell = normalize_with_comparison(corrected)
    else:
        normalized, n_spell = corrected, 0
    final = normalized if normalized else corrected
    score_input = final if final else text
    q = calculate_quality_score(
        text=score_input, confidence_scores=confidences, dictionary_corrections=n_corr or 0
    )
    unknown = sorted(get_unknown_words(score_input))
    return {
        "extracted_text": corrected,
        "normalized_text": normalized,
        "dictionary_corrections": n_corr,
        "spelling_changes": n_spell,
        "quality": {
            "overall": q.overall,
            "label": q.label,
            "confidence": q.confidence,
            "dictionary_match": q.dictionary_match,
            "correction_rate": q.correction_rate,
            "total_words": q.total_words,
            "matched_words": q.matched_words,
            "corrected_words": q.corrected_words,
        },
        "unknown_words": unknown,
    }


def corpus():
    cases = []
    # 1. real OCR previews shipped in the reference's history DB
    con = sqlite3.connect(f"{REF}/ocr_history.db")
    rows = con.execute(
        "SELECT DISTINCT text_preview FROM ocr_history WHERE text_preview IS NOT NULL"
    ).fetchall()
    for i, (preview,) in enumerate(rows):
        cases.append((f"history-{i:02d}", preview))
    # 2. inline smoke cases from the reference's __main__ blocks
    smoke = [
        "DEPARTNN PCAAI DAN TENAGA",
        "Jelan Kramet 63 Jakrta",
        "Rumah tersebut dibawah ini",
        "Gaji pokok Rp. 277",
        "Nomoa 2078",
        "Oetara adalah arah jang penting",
        "Djalan ini menoedju ke pasar",
        "Tjari barang di toko itoe",
        "Njamuk sangat mengganggu",
        "Sjarat utama adalah kedjujoeran",
        "Chabar baik dari project manager",
    ]
    for i, t in enumerate(smoke):
        cases.append((f"smoke-{i:02d}", t))
    # 3. branch-coverage synthetics (FIXTURES.md §3)
    synth = [
        "11Septenbor di kantor",
        "Septenbor1962 tercatat",
        "Rumah. Dopartoron/wta berkas",
        "SOPTONBER Soptonber soptonber",
        "pusat camat\ntenggara",
        "awal eepp akhir",
        "Rp.277.-- dan Ru. 500 dan Rpy 25",
        "total ..277 sisa .35",
        "25.z00 rupiah",
        "Rp lOz5 tertulis",
        "September 962 dan Maret 97l",
        "ll Maret dan 19 71 Desember 19 71",
        "tahun 1g63 dan 196l dan 20l4",
        "plh dan P1h dan kelima ribu dan s0ratus",
        "Kasm.nem dan Sukatil dan Maineh",
        "Oetara DJALAN Tjatatan NJONJA sjarat CHABAR",
        "jang JANG Jang ja jaitu jaitoe jangan",
        "project adjacent penunjukan panjang",
        "",
        "   \n\t  ",
        "12345 67890",
        "a b cd ef",
        "--- Halaman 1 ---\nKATP ANGAN PNID JUKYAN RUMAH NFG ARA",
        "gadji - pokok Rp.277.-- 11Septenbor 962",
        "Djelan Krmet 63 tempat tinga1 saja",
        "kotaoran besar",
        "Wakil-wakil pem'rintah datang",
        "O'Brien re-check ko-ordinasi",
    ]
    for i, t in enumerate(synth):
        cases.append((f"synth-{i:02d}", t))
    return cases


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    flag_combos = [(False, False), (True, False), (False, True), (True, True)]
    conf_sets = {"none": [], "frac": [0.92, 0.88, 0.95, 0.78, 0.85], "pct": [88.0, 95.0, 40.0]}
    fixtures = []
    for name, text in corpus():
        for use_dict, use_spell in flag_combos:
            for conf_name, confs in conf_sets.items():
                if conf_name != "none" and not name.startswith(("smoke-00", "history-00")):
                    continue  # confidence variants only on two inputs
                fixtures.append(
                    {
                        "name": f"{name}/d{int(use_dict)}s{int(use_spell)}/{conf_name}",
                        "input": text,
                        "use_dictionary": use_dict,
                        "use_spelling": use_spell,
                        "confidences": confs,
                        "expected": reference_pipeline(text, use_dict, use_spell, confs),
                    }
                )
    with open(OUT / "golden.json", "w", encoding="utf-8") as f:
        json.dump(fixtures, f, ensure_ascii=False, indent=1)
    print(f"wrote {len(fixtures)} fixtures to {OUT/'golden.json'}")


if __name__ == "__main__":
    main()
