"""SentencePiece-style tokenizer over a GGUF vocab.

Reference: model_tokenize / model_tokenizer_t (model_utils.cpp:397-620) —
the llama.cpp SPM bigram-merge algorithm over the vocab+scores stored in
the model file, with byte fallback. HF checkpoints use the HF tokenizer
instead (Model API picks automatically).
"""
from __future__ import annotations

import heapq
from typing import Dict, List, Optional, Sequence


class SPMTokenizer:
    def __init__(self, tokens: Sequence[str], scores: Sequence[float],
                 bos_id: int = 1, eos_id: int = 2, unk_id: int = 0,
                 add_space_prefix: bool = True):
        self.tokens = list(tokens)
        self.scores = list(scores)
        self.bos_id, self.eos_id, self.unk_id = bos_id, eos_id, unk_id
        self.add_space_prefix = add_space_prefix
        self.t2i: Dict[str, int] = {t: i for i, t in enumerate(self.tokens)}
        self.byte_ids: Dict[int, int] = {}
        for b in range(256):
            tok = f"<0x{b:02X}>"
            if tok in self.t2i:
                self.byte_ids[b] = self.t2i[tok]

    @classmethod
    def from_gguf(cls, reader) -> "SPMTokenizer":
        kv = reader.kv
        return cls(kv["tokenizer.ggml.tokens"],
                   list(kv.get("tokenizer.ggml.scores",
                               [0.0] * len(kv["tokenizer.ggml.tokens"]))),
                   bos_id=int(kv.get("tokenizer.ggml.bos_token_id", 1)),
                   eos_id=int(kv.get("tokenizer.ggml.eos_token_id", 2)),
                   unk_id=int(kv.get("tokenizer.ggml.unknown_token_id", 0)))

    def encode(self, text: str, add_bos: bool = True) -> List[int]:
        """Greedy bigram merge by score (llama.cpp llm_tokenizer_spm)."""
        if self.add_space_prefix:
            text = " " + text
        text = text.replace(" ", "▁")
        # initial symbols: utf-8 characters
        symbols: List[str] = list(text)

        # merge loop: repeatedly merge the adjacent pair with best score
        def pair_score(a: str, b: str):
            tid = self.t2i.get(a + b)
            return None if tid is None else self.scores[tid]

        heap = []
        alive = list(range(len(symbols)))
        prev = [i - 1 for i in range(len(symbols))]
        nxt = [i + 1 if i + 1 < len(symbols) else -1
               for i in range(len(symbols))]
        text_at = {i: s for i, s in enumerate(symbols)}
        counter = 0
        for i in range(len(symbols) - 1):
            sc = pair_score(symbols[i], symbols[i + 1])
            if sc is not None:
                heapq.heappush(heap, (-sc, counter, i, i + 1,
                                      symbols[i] + symbols[i + 1]))
                counter += 1
        while heap:
            negsc, _, li, ri, merged = heapq.heappop(heap)
            if li not in text_at or ri not in text_at:
                continue
            if text_at[li] + text_at[ri] != merged:
                continue
            text_at[li] = merged
            del text_at[ri]
            rn = nxt[ri]
            nxt[li] = rn
            if rn != -1:
                prev[rn] = li
            ln = prev[li]
            if ln != -1 and ln in text_at:
                sc = pair_score(text_at[ln], text_at[li])
                if sc is not None:
                    heapq.heappush(heap, (-sc, counter, ln, li,
                                          text_at[ln] + text_at[li]))
                    counter += 1
            if rn != -1 and rn in text_at:
                sc = pair_score(text_at[li], text_at[rn])
                if sc is not None:
                    heapq.heappush(heap, (-sc, counter, li, rn,
                                          text_at[li] + text_at[rn]))
                    counter += 1

        ids: List[int] = [self.bos_id] if add_bos else []
        for i in sorted(text_at):
            piece = text_at[i]
            tid = self.t2i.get(piece)
            if tid is not None:
                ids.append(tid)
            else:  # byte fallback (model_utils.cpp unk/byte path)
                for b in piece.encode("utf-8"):
                    ids.append(self.byte_ids.get(b, self.unk_id))
        return ids

    def decode(self, ids: Sequence[int], skip_special: bool = True) -> str:
        out = []
        byte_buf = bytearray()

        def flush():
            if byte_buf:
                out.append(byte_buf.decode("utf-8", errors="replace"))
                byte_buf.clear()

        for i in ids:
            if skip_special and i in (self.bos_id, self.eos_id):
                continue
            t = self.tokens[i]
            if t.startswith("<0x") and t.endswith(">") and len(t) == 6:
                byte_buf.append(int(t[3:5], 16))
                continue
            flush()
            out.append(t)
        flush()
        s = "".join(out).replace("▁", " ")
        return s[1:] if self.add_space_prefix and s.startswith(" ") else s
