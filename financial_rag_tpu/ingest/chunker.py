"""Two-tier parent/child chunker.

Behavioral contract of the reference chunker (reference
parent_child/parent_child_chunker.py:101-235):

- HTML-aware normalization: <br> and closing block tags become newlines,
  remaining tags stripped, entities unescaped, whitespace collapsed;
- heuristic token count = word count x 1.3;
- PARENTS: consecutive page blocks packed until parent_max_tokens (default
  1500), joined with newlines, carrying page_start/page_end;
- CHILDREN: per parent, sentence-accumulation up to child_max_tokens
  (default 300) with a trailing word overlap (default 80 words); if that
  yields <=1 chunk or an oversized chunk (tables/lists), a line/window pass
  with the same overlap; if that yields nothing, hard word windows.

IDs are snowflakes; embeddings are NOT attached here — the pipeline embeds
children in large device batches (the reference's optional fused-embedding
chunker path is provided by DualEncoder.encode_fused instead).
"""

from __future__ import annotations

import html as html_mod
import re
from dataclasses import dataclass
from typing import List, Optional

from financial_rag_tpu.config import ChunkingConfig
from financial_rag_tpu.store.snowflake import SnowflakeGenerator

_WORD_RE = re.compile(r"\w+")
_BR_RE = re.compile(r"<\s*br\s*/?>", re.IGNORECASE)
_BLOCK_CLOSE_RE = re.compile(r"</\s*(p|div|tr|table|h\d)\s*>", re.IGNORECASE)
_TAG_RE = re.compile(r"<[^>]+>")
_SENT_SPLIT_RE = re.compile(r"[.!?]\s+")


@dataclass
class ParentChunk:
    parent_id: int
    document_id: str
    content: str
    page_start: int
    page_end: int
    token_count: int = 0


@dataclass
class ChildChunk:
    child_id: int
    parent_id: int
    content: str
    context: Optional[str] = None
    token_count: int = 0


def normalize_text(text: str) -> str:
    if "<" in text and ">" in text:
        t = _BR_RE.sub("\n", text)
        t = _BLOCK_CLOSE_RE.sub("\n", t)
        t = _TAG_RE.sub(" ", t)
        t = html_mod.unescape(t)
    else:
        t = text
    t = re.sub(r"[ \t\r\f]+", " ", t)
    t = re.sub(r"\n\s*\n+", "\n", t)
    return t.strip()


def token_estimate(text: str) -> int:
    return int(len(_WORD_RE.findall(text)) * 1.3)


class ParentChildChunker:
    def __init__(self, config: Optional[ChunkingConfig] = None,
                 id_gen: Optional[SnowflakeGenerator] = None) -> None:
        self.cfg = config or ChunkingConfig()
        self.id_gen = id_gen or SnowflakeGenerator()

    # ------------------------------------------------------------- parents

    def make_parents(self, blocks: List[dict], document_id: str) -> List[ParentChunk]:
        parents: List[ParentChunk] = []
        buf: List[str] = []
        acc = 0
        page_start: Optional[int] = None
        page_end: Optional[int] = None

        def emit():
            nonlocal buf, acc
            content = "\n".join(buf).strip()
            if content:
                parents.append(ParentChunk(
                    parent_id=self.id_gen.next_id(),
                    document_id=document_id,
                    content=content,
                    page_start=page_start or 0,
                    page_end=page_end if page_end is not None else (page_start or 0),
                    token_count=token_estimate(content),
                ))

        for b in blocks:
            text = normalize_text(b.get("content") or b.get("html") or "")
            if not text:
                continue
            page = int(b.get("page", 0) or 0)
            tlen = token_estimate(text)
            if page_start is None:
                page_start = page
            if acc + tlen > self.cfg.parent_max_tokens and buf:
                emit()
                buf, acc = [text], tlen
                page_start = page_end = page
            else:
                buf.append(text)
                acc += tlen
                page_end = page
        if buf:
            emit()
        return parents

    # ------------------------------------------------------------ children

    def split_child_texts(self, text: str) -> List[str]:
        def oversized(cs: List[str]) -> bool:
            return bool(cs) and max(token_estimate(c) for c in cs) > int(self.cfg.child_max_tokens * 0.9)

        chunks = self._sentence_pass(text)
        if len(chunks) <= 1 or oversized(chunks):
            line_chunks = self._line_window_pass(text)
            # a single-line blob defeats the line pass too; hard windows are
            # the guaranteed splitter (goes beyond the reference, which
            # returns one oversized chunk here)
            if not line_chunks or (len(line_chunks) <= 1 and oversized(line_chunks)
                                   and token_estimate(text) > self.cfg.child_max_tokens):
                line_chunks = self._hard_window_pass(text)
            if line_chunks:
                chunks = line_chunks
        return [c for c in chunks if c]

    def _sentence_pass(self, text: str) -> List[str]:
        out: List[str] = []
        cur = ""
        for sent in _SENT_SPLIT_RE.split(text):
            if not sent:
                continue
            merged = sent if not cur else f"{cur} {sent}"
            if token_estimate(merged) > self.cfg.child_max_tokens and cur:
                out.append(cur.strip())
                tail = cur.split()[-self.cfg.child_overlap_words:]
                cur = (" ".join(tail) + " " + sent).strip()
            else:
                cur = merged
        if cur:
            out.append(cur.strip())
        return [c for c in out if c]

    def _line_window_pass(self, text: str) -> List[str]:
        lines = [ln.strip() for ln in text.splitlines() if ln.strip()]
        out: List[str] = []
        buf: List[str] = []
        acc = 0
        for ln in lines:
            tlen = token_estimate(ln)
            if acc + tlen > self.cfg.child_max_tokens and buf:
                win = "\n".join(buf).strip()
                out.append(win)
                tail = win.split()[-self.cfg.child_overlap_words:]
                buf = [" ".join(tail), ln]
                acc = token_estimate(buf[0]) + tlen
            else:
                buf.append(ln)
                acc += tlen
        if buf:
            out.append("\n".join(buf).strip())
        return [c for c in out if c]

    def _hard_window_pass(self, text: str) -> List[str]:
        words = text.split()
        step = max(self.cfg.child_max_tokens - self.cfg.child_overlap_words, 1)
        return [
            " ".join(words[i: i + self.cfg.child_max_tokens])
            for i in range(0, len(words), step)
            if words[i: i + self.cfg.child_max_tokens]
        ]

    def make_children(self, parents: List[ParentChunk]) -> List[ChildChunk]:
        children: List[ChildChunk] = []
        for p in parents:
            for text in self.split_child_texts(p.content):
                children.append(ChildChunk(
                    child_id=self.id_gen.next_id(),
                    parent_id=p.parent_id,
                    content=text,
                    token_count=token_estimate(text),
                ))
        return children

    def chunk(self, blocks: List[dict], document_id: str):
        parents = self.make_parents(blocks, document_id)
        children = self.make_children(parents)
        return parents, children
