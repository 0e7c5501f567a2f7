"""Text tokenization for the CLIP conditioning path.

The reference uses transformers ``CLIPTokenizer.from_pretrained``
(train_cam_ctrl.py:223-224) with the SD1.5 checkpoint's local vocab files —
a pure-Python dependency, kept (transformers is environment-provided, no
network needed for local files).  ``HashTokenizer`` is a deterministic
offline fallback for tests and for running without an SD checkpoint.
"""

from __future__ import annotations

import hashlib
import logging
import os

import numpy as np

logger = logging.getLogger("synfmc")

BOS_ID = 49406
EOS_ID = 49407
VOCAB_SIZE = 49408
MAX_LENGTH = 77


class HashTokenizer:
    """Deterministic word-hash tokenizer with the CLIP special-token layout:
    [BOS] ids... [EOS] then EOS-padding to max_length."""

    vocab_size = VOCAB_SIZE

    def __call__(self, texts, max_length: int = MAX_LENGTH) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        out = np.full((len(texts), max_length), EOS_ID, dtype=np.int32)
        for row, text in enumerate(texts):
            ids = [BOS_ID]
            for word in text.lower().split():
                h = int.from_bytes(hashlib.sha1(word.encode()).digest()[:4], "little")
                ids.append(1000 + h % (BOS_ID - 1001))
                if len(ids) >= max_length - 1:
                    break
            ids.append(EOS_ID)
            out[row, : len(ids)] = ids
        return out


def load_tokenizer(pretrained_path: str | None = None, strict: bool = False):
    """CLIPTokenizer from a local SD checkpoint dir, else the hash fallback.

    The fallback is LOUD: a run pointed at a slightly-wrong SD path would
    otherwise train on hash tokens and produce garbage conditioning while
    looking healthy.  ``strict=True`` (config ``strict_pretrained``) makes
    the fallback fatal — the right setting for any real run.  '[path to
    ...]' placeholders count as no-path (quiet), matching load_pretrained.
    """
    from synfmc_tpu.config import is_placeholder_path

    if pretrained_path and is_placeholder_path(pretrained_path):
        pretrained_path = None
    if pretrained_path:
        tok_dir = os.path.join(pretrained_path, "tokenizer")
        target = tok_dir if os.path.isdir(tok_dir) else pretrained_path
        if os.path.exists(os.path.join(target, "vocab.json")):
            from transformers import CLIPTokenizer

            tok = CLIPTokenizer.from_pretrained(target)

            def encode(texts, max_length: int = MAX_LENGTH):
                if isinstance(texts, str):
                    texts = [texts]
                enc = tok(
                    texts, padding="max_length", max_length=max_length,
                    truncation=True, return_tensors="np",
                )
                return enc["input_ids"].astype(np.int32)

            return encode
    if strict:
        raise FileNotFoundError(
            f"strict_pretrained: no CLIP tokenizer vocab.json under "
            f"{pretrained_path!r} — refusing the HashTokenizer fallback"
        )
    if pretrained_path:
        logger.error(
            f"no CLIP vocab.json under {pretrained_path!r} — FALLING BACK to "
            f"the deterministic HashTokenizer. Text conditioning will be "
            f"meaningless with real weights; set strict_pretrained: true to "
            f"make this fatal."
        )
    return HashTokenizer()
