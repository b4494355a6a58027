"""Tokenizer, vocabulary, and GloVe loading.

Behavioral spec: reference utils/text_utils.py:9-73. The tokenizer strips
punctuation, lowercases, drops length-1 tokens and non-alpha tokens; ids:
<NONE>=0 <START>=1 <END>=2 <UNK>=3.
"""

from __future__ import annotations

import json
import os
import string
from typing import Dict, Tuple

import numpy as np

NONE_ID, START_ID, END_ID, UNK_ID = 0, 1, 2, 3


def parse_sent(desc: str):
    """Tokenize + clean (reference text_utils.py:9-26)."""
    table = str.maketrans("", "", string.punctuation)
    words = [w.lower().translate(table) for w in desc.split()]
    words = [w for w in words if len(w) > 1]
    return [w for w in words if w.isalpha()]


def load_vocab(vocab_dir: str, dataset: str, session: int
               ) -> Tuple[Dict[str, int], Dict[int, str],
                          Dict[str, int], Dict[int, str]]:
    """Load request + operator vocabularies (reference text_utils.py:29-39).

    The JSON files are token->id dicts in id order; enumeration re-derives
    the same mapping.
    """
    with open(os.path.join(vocab_dir, f"{dataset}_vocabs_sess_{session}.json")) as f:
        vocab = json.load(f)
    with open(os.path.join(
            vocab_dir, f"{dataset}_operator_vocabs_sess_{session}.json")) as f:
        op_vocab = json.load(f)
    vocab2id = {tok: i for i, tok in enumerate(vocab)}
    id2vocab = {i: tok for i, tok in enumerate(vocab)}
    op2id = {tok: i for i, tok in enumerate(op_vocab)}
    id2op = {i: tok for i, tok in enumerate(op_vocab)}
    return vocab2id, id2vocab, op2id, id2op


def txt2idx(sent: str, vocab2id: Dict[str, int], max_len: int) -> np.ndarray:
    """Request string -> (1, max_len) padded id row with START/END
    (reference text_utils.py:42-67)."""
    def tok2id(tok):
        return vocab2id.get(tok, UNK_ID)

    body = max_len - 2
    tokens = parse_sent(sent)
    ids = np.zeros(body, dtype=np.int64)
    valid = [tok2id(t) for t in tokens][:body]
    ids[: len(valid)] = valid
    out = ids.tolist()
    zeros = np.where(ids == 0)[0]
    if len(zeros) > 0:
        out.insert(int(zeros[0]), END_ID)
    else:
        out.append(END_ID)
    out.insert(0, START_ID)
    return np.asarray(out, dtype=np.int64)[None]


def load_embedding(path: str) -> np.ndarray:
    """GloVe word matrix from h5 (reference text_utils.py:70-73)."""
    import h5py

    with h5py.File(path, "r") as f:
        return np.asarray(f["glove"][()], np.float32)
