"""Mu-letter FASTA I/O (the reference's -dbmu input and
`-convert -feature_fasta -alpha Mu` output).

Characters: 0-25 -> 'A'-'Z', 26-35 -> 'a'-'j' (GetFeatureChar,
src/pdbchain.cpp:70-125).  Reading applies the reference's
g_CharToLetterMu table, which swaps 'K'<->'L' to letters 11/10
(src/alpha.cpp; see the parity note in search/prefilter.py) — so FASTA
round-trips match the reference's ToLetters exactly.
"""

from __future__ import annotations

from typing import Iterator, List, Tuple

import numpy as np

_CHAR_TO_MU = np.full(256, 255, np.uint8)
for _v in range(26):
    _CHAR_TO_MU[ord("A") + _v] = _v
for _v in range(26, 36):
    _CHAR_TO_MU[ord("a") + _v - 26] = _v
# reference g_CharToLetterMu quirk: 'K' -> 11, 'L' -> 10
_CHAR_TO_MU[ord("K")] = 11
_CHAR_TO_MU[ord("L")] = 10


def iter_mu_fasta(path: str) -> Iterator[Tuple[str, np.ndarray]]:
    """Yield (label, mu_letters uint8) per record."""
    label = None
    parts: List[str] = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if line.startswith(">"):
                if label is not None:
                    yield label, _decode("".join(parts))
                label = line[1:].split()[0]
                parts = []
            else:
                parts.append(line)
    if label is not None:
        yield label, _decode("".join(parts))


def _decode(s: str) -> np.ndarray:
    arr = _CHAR_TO_MU[np.frombuffer(s.encode("ascii"), np.uint8)]
    if (arr == 255).any():
        bad = s[int(np.argmax(arr == 255))]
        raise ValueError(f"invalid Mu letter character {bad!r}")
    return arr
