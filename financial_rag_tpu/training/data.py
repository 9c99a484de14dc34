"""Training-pair batching for contrastive fine-tuning.

Turns (query, positive-document) text pairs into the fixed-shape int32
batches make_train_step consumes: WordPiece-tokenized, padded to a static
sequence length, batch padded to a multiple of the data-axis size. Includes
a weak-supervision helper that manufactures pseudo-queries from indexed
children (lead sentence -> query, full child -> document), so the encoders
can be tuned on a corpus with no labels — a capability the reference lacks
entirely (it has no training path).
"""

from __future__ import annotations

import re
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from financial_rag_tpu.tokenizer import WordPieceTokenizer

_SENT_RE = re.compile(r"[.!?]\s+")


def pseudo_pairs_from_children(child_texts: Sequence[str], *,
                               min_words: int = 12) -> List[Tuple[str, str]]:
    """Weak supervision: the lead sentence queries the full chunk."""
    pairs = []
    for text in child_texts:
        if len(text.split()) < min_words:
            continue
        lead = _SENT_RE.split(text.strip(), maxsplit=1)[0].strip()
        if len(lead.split()) >= 3:
            pairs.append((lead, text))
    return pairs


class PairBatcher:
    def __init__(self, tokenizer: Optional[WordPieceTokenizer] = None,
                 max_seq_len: int = 128) -> None:
        self.tokenizer = tokenizer or WordPieceTokenizer()
        self.max_seq_len = max_seq_len

    def _encode(self, texts: Sequence[str], batch: int) -> Tuple[np.ndarray, np.ndarray]:
        ids = np.full((batch, self.max_seq_len), self.tokenizer.pad_id, np.int32)
        mask = np.zeros((batch, self.max_seq_len), np.int32)
        for r, t in enumerate(texts):
            seq = self.tokenizer.encode(t, max_len=self.max_seq_len)
            ids[r, : len(seq)] = seq
            mask[r, : len(seq)] = 1
        mask[len(texts):, 0] = 1  # keep padded rows non-degenerate
        return ids, mask

    def batches(self, pairs: Sequence[Tuple[str, str]], batch_size: int,
                *, shuffle_seed: Optional[int] = 0,
                drop_remainder: bool = False) -> Iterator[dict]:
        """Yields {q_ids, q_mask, d_ids, d_mask} with static [B, S] shapes."""
        order = np.arange(len(pairs))
        if shuffle_seed is not None:
            np.random.default_rng(shuffle_seed).shuffle(order)
        for lo in range(0, len(order), batch_size):
            sel = order[lo: lo + batch_size]
            if drop_remainder and len(sel) < batch_size:
                return
            qs = [pairs[i][0] for i in sel]
            ds = [pairs[i][1] for i in sel]
            q_ids, q_mask = self._encode(qs, batch_size)
            d_ids, d_mask = self._encode(ds, batch_size)
            yield {"q_ids": q_ids, "q_mask": q_mask,
                   "d_ids": d_ids, "d_mask": d_mask}
