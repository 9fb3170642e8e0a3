"""PDF/layout parsing: positioned tokens -> lines -> columns -> text.

The north_star's "PDF layout parsing with line/column clustering": input is
the layout-token table a PDF text extractor produces — per token
(x, y, w, h, text) in page coordinates — and output is reading-order text.

Algorithm (standard geometric layout analysis, cf. XY-cut):
1. **Line clustering**: sort tokens by y; greedily merge tokens whose y
   differs from the running line baseline by <= y_tol (half a line height).
   Tokens within a line sort by x.
2. **Column detection**: build the x-interval union of all lines; a
   vertical whitespace valley wider than ``gap_min`` that spans most lines
   splits the page into columns (recursively, widest valley first).
3. **Reading order**: columns left-to-right, lines top-to-bottom within a
   column; tokens joined by single spaces, lines by newlines, columns by
   blank lines.

Pure Python single-page semantics; vectorized per turn/page by
``ocr_spark.operators.boilerplate.parse_layout``. Deterministic: ties break
on (y, x, text).
"""
from __future__ import annotations

from typing import Sequence

Token = tuple[float, float, float, float, str]  # (x, y, w, h, text)


def cluster_lines(
    tokens: Sequence[Token], y_tol: float = 0.5
) -> list[list[Token]]:
    """Group tokens into lines by y proximity. ``y_tol`` is an absolute
    tolerance in the same units as y (callers pass ~half the line pitch)."""
    if not tokens:
        return []
    toks = sorted(tokens, key=lambda t: (t[1], t[0], t[4]))
    lines: list[list[Token]] = []
    cur: list[Token] = [toks[0]]
    cur_y = toks[0][1]
    for t in toks[1:]:
        if abs(t[1] - cur_y) <= y_tol:
            cur.append(t)
            # running mean keeps drift bounded on slightly sloped baselines
            cur_y += (t[1] - cur_y) / len(cur)
        else:
            lines.append(sorted(cur, key=lambda t: (t[0], t[4])))
            cur = [t]
            cur_y = t[1]
    lines.append(sorted(cur, key=lambda t: (t[0], t[4])))
    return lines


def detect_columns(
    lines: list[list[Token]], gap_min: float, gutter_ratio: float = 3.0
) -> list[tuple[float, float]]:
    """Find column x-ranges via whitespace valleys (XY-cut style).

    Candidate valleys are gaps in the merged union of all token
    x-intervals. A valley is a real gutter only when it is wide relative
    to ordinary word spacing: >= ``gap_min`` AND >= ``gutter_ratio`` ×
    the median within-line inter-token gap (an aligned word gap is about
    median-sized; a column gutter is several times wider). Returns column
    (x_lo, x_hi) ranges, left to right (one full-width range when no
    gutter qualifies)."""
    if not lines:
        return []
    intervals = sorted(
        (t[0], t[0] + t[2]) for line in lines for t in line
    )
    page_lo = intervals[0][0]
    page_hi = max(hi for _, hi in intervals)
    merged: list[list[float]] = []
    for lo, hi in intervals:
        if merged and lo <= merged[-1][1] + 1e-9:
            merged[-1][1] = max(merged[-1][1], hi)
        else:
            merged.append([lo, hi])
    word_gaps = sorted(
        line[i + 1][0] - (line[i][0] + line[i][2])
        for line in lines
        for i in range(len(line) - 1)
        if line[i + 1][0] > line[i][0] + line[i][2]
    )
    median_gap = word_gaps[len(word_gaps) // 2] if word_gaps else 0.0
    threshold = max(gap_min, gutter_ratio * median_gap)
    gutters = [
        (merged[i][1], merged[i + 1][0])
        for i in range(len(merged) - 1)
        if merged[i + 1][0] - merged[i][1] >= threshold
    ]
    if not gutters:
        return [(page_lo, page_hi)]
    bounds = [page_lo]
    for lo, hi in gutters:
        bounds.append((lo + hi) / 2)
    bounds.append(page_hi)
    return [(bounds[i], bounds[i + 1]) for i in range(len(bounds) - 1)]


def layout_text(
    tokens: Sequence[Token],
    y_tol: float = 0.5,
    gap_min: float = 3.0,
) -> dict:
    """Full page reconstruction: lines -> columns -> reading-order text.
    Returns the text plus layout counters (lines, columns)."""
    lines = cluster_lines(tokens, y_tol)
    columns = detect_columns(lines, gap_min)
    col_texts: list[str] = []
    for lo, hi in columns:
        col_lines = []
        for line in lines:
            seg = [t for t in line if lo <= (t[0] + t[0] + t[2]) / 2 < hi or
                   (hi == columns[-1][1] and (t[0] + t[0] + t[2]) / 2 == hi)]
            if seg:
                col_lines.append(" ".join(t[4] for t in seg))
        if col_lines:
            col_texts.append("\n".join(col_lines))
    return {
        "text": "\n\n".join(col_texts),
        "n_lines": len(lines),
        "n_columns": len(columns),
        "n_tokens": len(tokens),
    }
