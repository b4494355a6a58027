"""Pure-numpy COCO RLE mask decoding.

Replaces the pycocotools C extension the reference relies on (reference:
data/GIER/GIER.py:18, 272). The format (pycocotools rleFrString): counts
are stored as a printable-ASCII LEB128 variant (5 bits/char, offset 48,
bit 5 = continuation, sign-extended), with every count from the FOURTH
onward delta-encoded against the count two positions back (rleFrString:
`if (m > 2) x += cnts[m-2]` — the first three are raw); the mask unrolls
column-major (Fortran order), starting with zeros.

A C++ implementation with the same contract lives in native/ (used when
built); this numpy path is the always-available fallback.
"""

from __future__ import annotations

from typing import Dict, List, Union

import numpy as np


def _counts_from_string(s: Union[str, bytes]) -> np.ndarray:
    if isinstance(s, str):
        s = s.encode("ascii")
    counts: List[int] = []
    i = 0
    n = len(s)
    while i < n:
        x = 0
        k = 0
        more = True
        while more:
            c = s[i] - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)      # sign extension
        if len(counts) > 2:
            x += counts[-2]             # delta vs count two back
        counts.append(x)
    return np.asarray(counts, np.int64)


def rle_decode(rle: Dict) -> np.ndarray:
    """{'size': [h, w], 'counts': str|list} -> (h, w) uint8 mask."""
    h, w = rle["size"]
    counts = rle["counts"]
    if isinstance(counts, (str, bytes)):
        counts = _counts_from_string(counts)
    else:
        counts = np.asarray(counts, np.int64)
    total = int(counts.sum())
    assert total == h * w, f"RLE counts sum {total} != h*w {h * w}"
    # runs alternate 0,1,0,1,... column-major
    vals = np.zeros(len(counts), np.uint8)
    vals[1::2] = 1
    flat = np.repeat(vals, counts)
    return flat.reshape((w, h)).T.copy()    # F-order unroll


def rle_encode(mask: np.ndarray) -> Dict:
    """(h, w) {0,1} mask -> uncompressed RLE dict (counts list)."""
    h, w = mask.shape
    flat = np.asarray(mask, np.uint8).T.reshape(-1)   # column-major
    # run-length encode starting with zeros
    change = np.flatnonzero(np.diff(flat)) + 1
    bounds = np.concatenate([[0], change, [flat.size]])
    counts = np.diff(bounds).tolist()
    if flat.size and flat[0] == 1:
        counts = [0] + counts
    return {"size": [int(h), int(w)], "counts": counts}
