"""Alignment path (MDI chars) <-> CIGAR strings (src/cigar.cpp)."""

from __future__ import annotations

import re


def path_to_cigar(path: str, flip_di: bool = False) -> str:
    """Run-length encode an M/D/I path (src/cigar.cpp:95-126).
    flip_di swaps D and I for the target-orientation row."""
    if not path:
        return ""
    out = []
    last = None
    n = 0
    for c in path:
        if flip_di:
            c = "I" if c == "D" else ("D" if c == "I" else c)
        if c == last:
            n += 1
        else:
            if last is not None:
                out.append(f"{n}{last}")
            last = c
            n = 1
    out.append(f"{n}{last}")
    return "".join(out)


def cigar_to_path(cigar: str) -> str:
    """Expand a CIGAR back to an M/D/I path; S/T prefixes are skipped."""
    path = []
    for count, op in re.findall(r"(\d+)([MDIST])", cigar):
        if op in "MDI":
            path.append(op * int(count))
    return "".join(path)
