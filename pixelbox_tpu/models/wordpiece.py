"""Self-contained BERT-style WordPiece tokenizer.

The reference ships a HuggingFace ``tokenizer.json`` (WordPiece, BERT
normalization) next to its BLIP config (reference models/blip-tokenizer.json)
but wires it to nothing.  This implements the same scheme — lowercasing,
accent stripping, punctuation splitting, greedy longest-match WordPiece
with ``##`` continuations — loading its vocab either from a HF
tokenizer.json file or from a plain vocab list.  No copied assets: point
``from_tokenizer_json`` at any BERT-family tokenizer file at runtime.
"""

from __future__ import annotations

import json
import unicodedata
from typing import Dict, List, Sequence

PAD, UNK, CLS, SEP, MASK = "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"


def _is_punctuation(ch: str) -> bool:
    cp = ord(ch)
    if (33 <= cp <= 47) or (58 <= cp <= 64) or (91 <= cp <= 96) or (123 <= cp <= 126):
        return True
    return unicodedata.category(ch).startswith("P")


class WordPieceTokenizer:
    def __init__(
        self,
        vocab: Dict[str, int],
        lowercase: bool = True,
        max_input_chars_per_word: int = 100,
    ):
        self.vocab = vocab
        self.inv_vocab = {v: k for k, v in vocab.items()}
        self.lowercase = lowercase
        self.max_input_chars_per_word = max_input_chars_per_word
        self.pad_id = vocab.get(PAD, 0)
        self.unk_id = vocab.get(UNK, 0)
        self.cls_id = vocab.get(CLS, 0)
        self.sep_id = vocab.get(SEP, 0)

    # ------------------------------------------------------------------ #

    @classmethod
    def from_tokenizer_json(cls, path: str) -> "WordPieceTokenizer":
        """Load vocab from a HuggingFace tokenizer.json (WordPiece model)."""
        with open(path) as f:
            data = json.load(f)
        vocab = data["model"]["vocab"]
        lowercase = True
        norm = data.get("normalizer") or {}
        if isinstance(norm, dict) and norm.get("lowercase") is False:
            lowercase = False
        return cls(vocab, lowercase=lowercase)

    @classmethod
    def toy(cls, words: Sequence[str] = ()) -> "WordPieceTokenizer":
        """A tiny vocab for tests: specials + single chars + given words."""
        vocab = {PAD: 0, UNK: 100, CLS: 101, SEP: 102, MASK: 103}
        next_id = 1000
        for ch in "abcdefghijklmnopqrstuvwxyz0123456789":
            vocab[ch] = next_id
            next_id += 1
            vocab["##" + ch] = next_id
            next_id += 1
        for w in words:
            if w not in vocab:
                vocab[w] = next_id
                next_id += 1
        return cls(vocab)

    # ------------------------------------------------------------------ #

    def _basic_tokenize(self, text: str) -> List[str]:
        if self.lowercase:
            text = text.lower()
            text = unicodedata.normalize("NFD", text)
            text = "".join(c for c in text if unicodedata.category(c) != "Mn")
        out: List[str] = []
        word: List[str] = []
        for ch in text:
            if ch.isspace():
                if word:
                    out.append("".join(word))
                    word = []
            elif _is_punctuation(ch):
                if word:
                    out.append("".join(word))
                    word = []
                out.append(ch)
            else:
                word.append(ch)
        if word:
            out.append("".join(word))
        return out

    def _wordpiece(self, word: str) -> List[int]:
        if len(word) > self.max_input_chars_per_word:
            return [self.unk_id]
        ids: List[int] = []
        start = 0
        while start < len(word):
            end = len(word)
            cur = None
            while start < end:
                piece = word[start:end]
                if start > 0:
                    piece = "##" + piece
                if piece in self.vocab:
                    cur = self.vocab[piece]
                    break
                end -= 1
            if cur is None:
                return [self.unk_id]
            ids.append(cur)
            start = end
        return ids

    def encode(
        self, text: str, max_len: int = 64, add_special: bool = True
    ) -> List[int]:
        ids: List[int] = []
        for word in self._basic_tokenize(text):
            ids.extend(self._wordpiece(word))
        if add_special:
            ids = [self.cls_id] + ids[: max_len - 2] + [self.sep_id]
        else:
            ids = ids[:max_len]
        return ids

    def encode_batch(self, texts: Sequence[str], max_len: int = 64):
        """→ (ids [B, max_len] int32, mask [B, max_len] int32) padded."""
        import numpy as np

        out = np.full((len(texts), max_len), self.pad_id, dtype=np.int32)
        mask = np.zeros((len(texts), max_len), dtype=np.int32)
        for i, t in enumerate(texts):
            ids = self.encode(t, max_len=max_len)
            out[i, : len(ids)] = ids
            mask[i, : len(ids)] = 1
        return out, mask
