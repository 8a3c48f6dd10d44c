"""Tokenizer wrappers.

HuggingfaceTokenizer ports the reference wrapper
(``animation/diffsynth/models/wan_video_text_encoder.py:285-330``):
whitespace/lower/canonicalize cleaning + padded/truncated ids and masks
(UMT5 path, seq_len 512).  CLIPTokenizerWrapper covers the SDXL dual
tokenizers (77-token CLIP BPE via transformers).

Both return numpy int arrays (no torch).  transformers is only imported
on construction so the module stays importable in minimal environments.
"""
from __future__ import annotations

import html
import re
import string
from typing import Optional


def basic_clean(text: str) -> str:
    try:
        import ftfy

        text = ftfy.fix_text(text)
    except Exception:
        pass
    text = html.unescape(html.unescape(text))
    return text.strip()


def whitespace_clean(text: str) -> str:
    return re.sub(r"\s+", " ", text).strip()


def canonicalize(text: str, keep_punctuation_exact_string: Optional[str] = None) -> str:
    text = text.replace("_", " ")
    if keep_punctuation_exact_string:
        text = keep_punctuation_exact_string.join(
            part.translate(str.maketrans("", "", string.punctuation))
            for part in text.split(keep_punctuation_exact_string)
        )
    else:
        text = text.translate(str.maketrans("", "", string.punctuation))
    text = text.lower()
    return re.sub(r"\s+", " ", text).strip()


class HuggingfaceTokenizer:
    def __init__(self, name: str, seq_len: Optional[int] = None,
                 clean: Optional[str] = None, **kwargs):
        assert clean in (None, "whitespace", "lower", "canonicalize")
        from transformers import AutoTokenizer

        self.name = name
        self.seq_len = seq_len
        self.clean = clean
        self.tokenizer = AutoTokenizer.from_pretrained(name, **kwargs)
        self.vocab_size = self.tokenizer.vocab_size

    def _clean(self, text):
        if self.clean == "whitespace":
            return whitespace_clean(basic_clean(text))
        if self.clean == "lower":
            return whitespace_clean(basic_clean(text)).lower()
        if self.clean == "canonicalize":
            return canonicalize(basic_clean(text))
        return text

    def __call__(self, sequence, return_mask: bool = False, **kwargs):
        _kwargs = {"return_tensors": "np"}
        if self.seq_len is not None:
            _kwargs.update(padding="max_length", truncation=True, max_length=self.seq_len)
        _kwargs.update(kwargs)
        if isinstance(sequence, str):
            sequence = [sequence]
        if self.clean:
            sequence = [self._clean(u) for u in sequence]
        ids = self.tokenizer(sequence, **_kwargs)
        if return_mask:
            return ids.input_ids, ids.attention_mask
        return ids.input_ids


class CLIPTokenizerWrapper:
    """77-token CLIP tokenizer (SDXL TE1/TE2)."""

    def __init__(self, name: str, **kwargs):
        from transformers import CLIPTokenizer

        self.tokenizer = CLIPTokenizer.from_pretrained(name, **kwargs)

    def __call__(self, text):
        out = self.tokenizer(
            [text] if isinstance(text, str) else text,
            padding="max_length", truncation=True, max_length=77,
            return_tensors="np",
        )
        return out.input_ids
