"""Main-content extraction: block tree -> features -> classification.

Boilerpipe/Readability-style main-content extraction (north_star surface):
a turn's text is segmented into a flat block tree (HTML block-level tags or
blank-line paragraphs, offsets preserved into the ORIGINAL string), each
block gets shallow text features (word count, link density, stopword
density), and a NumWordsRules-style classifier (the public Boilerpipe
algorithm: Kohlschütter et al., WSDM 2010 — decisions on word count + link
density of the previous/current/next block) labels blocks content vs
boilerplate. Extracted text is the kept blocks' cleaned text; spans are
[start, end) offsets of kept blocks in the original turn text.

Pure Python, single-row semantics — vectorized over Arrow batches by
``ocr_spark.operators.boilerplate``. No external parser: the tag scanner
handles the regular fragment of HTML (tags, comments, script/style
containers) which is what web-scrape transcripts contain; it never throws
on malformed input (fail-open to text).
"""
from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional

#: block-level elements that open/close a block boundary
_BLOCK_TAGS = frozenset(
    "p div h1 h2 h3 h4 h5 h6 li ul ol table tr td th blockquote pre section "
    "article header footer nav aside form figure br hr".split()
)
#: containers whose text content is never content
_IGNORE_CONTAINERS = frozenset({"script", "style", "noscript", "svg"})

_TAG_RE = re.compile(r"<(/?)([a-zA-Z][a-zA-Z0-9]*)[^>]*?(/?)>|<!--.*?-->", re.S)
_WS_RE = re.compile(r"\s+")
_WORD_RE = re.compile(r"\w[\w'-]*")

#: small stopword list shared with textstats' EN list (public function words)
_STOP = frozenset(
    "the of and to in a is that it for on with as are was at be this have "
    "from or by not but all were when we there can an your which their".split()
)


@dataclass
class Block:
    start: int                 # [start, end) into the ORIGINAL text
    end: int
    text: str = ""             # tag-stripped, whitespace-normalized
    n_words: int = 0
    n_linked_words: int = 0
    n_stop: int = 0
    tag: str = ""              # block-level tag that opened it ('' = para)
    n_seps: int = 0            # menu separators (| • ·)
    is_headline: bool = False
    is_content: Optional[bool] = None
    _parts: list = field(default_factory=list, repr=False)

    @property
    def link_density(self) -> float:
        return self.n_linked_words / self.n_words if self.n_words else 0.0

    @property
    def stop_density(self) -> float:
        return self.n_stop / self.n_words if self.n_words else 0.0


def _finish(block: Block, end: int) -> Optional[Block]:
    raw = " ".join(p for p in block._parts if p)
    text = _WS_RE.sub(" ", raw).strip()
    if not text:
        return None
    block.text = text
    words = _WORD_RE.findall(text)
    block.n_words = len(words)
    block.n_stop = sum(1 for w in words if w.lower() in _STOP)
    block.n_seps = text.count("|") + text.count("•") + text.count("·")
    block.end = end
    block.is_headline = block.tag in {"h1", "h2", "h3", "h4", "h5", "h6"}
    return block


def parse_blocks(text: str) -> list[Block]:
    """Segment into blocks with original-offset tracking.

    HTML path: block-level tags open/close blocks; anchor depth attributes
    words to links; script/style content is dropped. Plain-text path (no
    tags found): blank-line separated paragraphs.
    """
    if not text:
        return []
    if "<" not in text or not _TAG_RE.search(text):
        return _parse_paragraphs(text)

    blocks: list[Block] = []
    cur = Block(start=0, end=0)
    anchor_depth = 0
    ignore_depth = 0
    pos = 0

    def close(end: int, next_start: int, tag: str = "") -> None:
        nonlocal cur
        done = _finish(cur, end)
        if done is not None:
            blocks.append(done)
        cur = Block(start=next_start, end=next_start, tag=tag)

    for m in _TAG_RE.finditer(text):
        chunk = text[pos : m.start()]
        if chunk.strip() and not ignore_depth:
            if not cur._parts:
                cur.start = pos + (len(chunk) - len(chunk.lstrip()))
            cur._parts.append(chunk)
            if anchor_depth:
                cur.n_linked_words += len(_WORD_RE.findall(chunk))
        pos = m.end()
        if m.group(2) is None:       # comment
            continue
        closing, tag = m.group(1) == "/", m.group(2).lower()
        self_closed = m.group(3) == "/"
        if tag in _IGNORE_CONTAINERS:
            if not self_closed:  # <script/> has no content to ignore
                ignore_depth = (
                    max(0, ignore_depth - 1) if closing else ignore_depth + 1
                )
            continue
        if ignore_depth:
            continue
        if tag == "a":
            if not self_closed:  # <a/> opens no link scope
                anchor_depth = (
                    max(0, anchor_depth - 1) if closing else anchor_depth + 1
                )
            continue
        if tag in _BLOCK_TAGS:
            close(m.start(), m.end(), tag="" if closing else tag)
    tail = text[pos:]
    if tail.strip() and not ignore_depth:
        if not cur._parts:
            cur.start = pos + (len(tail) - len(tail.lstrip()))
        cur._parts.append(tail)
        if anchor_depth:
            cur.n_linked_words += len(_WORD_RE.findall(tail))
    close(len(text), len(text))
    return blocks


def _parse_paragraphs(text: str) -> list[Block]:
    blocks = []
    pos = 0
    for para in re.split(r"\n\s*\n", text):
        start = text.index(para, pos) if para else pos
        pos = start + len(para)
        b = Block(start=start, end=pos)
        b._parts.append(para)
        done = _finish(b, pos)
        if done is not None:
            blocks.append(done)
    return blocks


def classify_blocks(blocks: list[Block]) -> list[Block]:
    """NumWordsRules classification (public Boilerpipe algorithm): label by
    word counts of prev/curr/next and link densities. Headlines adjacent to
    content are kept (Readability-style title rescue)."""
    n = len(blocks)
    for i, b in enumerate(blocks):
        prev = blocks[i - 1] if i > 0 else None
        nxt = blocks[i + 1] if i + 1 < n else None
        prev_words = prev.n_words if prev else 0
        prev_ld = prev.link_density if prev else 0.0
        nxt_words = nxt.n_words if nxt else 0

        if b.link_density > 0.333333:
            b.is_content = False
        elif b.n_words <= 8 and b.n_words >= 2 and b.n_seps >= (b.n_words - 1) / 2:
            # pipe/bullet-separated short block = textual menu/breadcrumb
            # (the plain-text analog of a link-dense nav)
            b.is_content = False
        elif prev_ld <= 0.555556:
            b.is_content = (
                b.n_words > 16 or nxt_words > 15 or prev_words > 4
            )
        else:
            b.is_content = b.n_words > 40 or nxt_words > 17
    # headline rescue: a headline right before a content block is content
    for i, b in enumerate(blocks):
        if b.is_headline and not b.is_content:
            if i + 1 < n and blocks[i + 1].is_content:
                b.is_content = True
    return blocks


def extract_main_content(text: Optional[str]) -> dict:
    """Full per-turn main-content extraction. Returns extracted text (kept
    blocks joined by blank lines), [start,end) spans of kept blocks in the
    ORIGINAL text, and block counters (the lineage metrics the north rule
    tracks: blocks classified, bytes extracted)."""
    raw = text or ""
    blocks = classify_blocks(parse_blocks(raw))
    kept = [b for b in blocks if b.is_content]
    return {
        "content_text": "\n\n".join(b.text for b in kept),
        "content_spans": [(b.start, b.end) for b in kept],
        "n_blocks": len(blocks),
        "n_content_blocks": len(kept),
        "n_boilerplate_blocks": len(blocks) - len(kept),
        "content_words": sum(b.n_words for b in kept),
    }
