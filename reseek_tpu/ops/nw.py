"""Global (Needleman-Wunsch) alignment with separate terminal gap
penalties — the reference's -global mode (src/viterbifastmem.cpp:32-187,
defaults open=-1, ext=-0.05, terminal gaps free)."""

from __future__ import annotations

from typing import Tuple

import numpy as np

NEG = np.float32(-9e9)


def nw_align(S: np.ndarray, open_: float = -1.0, ext: float = -0.05,
             term_open: float = 0.0, term_ext: float = 0.0
             ) -> Tuple[float, str]:
    """Returns (score, path).  S: float32 [LA, LB] substitution scores."""
    la, lb = S.shape
    if la == 0 or lb == 0:
        return 0.0, ""
    f32 = np.float32
    open_, ext = f32(open_), f32(ext)
    term_open, term_ext = f32(term_open), f32(term_ext)

    m = np.full((la + 1, lb + 1), NEG, f32)  # match ending at (i-1, j-1)
    d = np.full((la + 1, lb + 1), NEG, f32)  # gap consuming A
    e = np.full((la + 1, lb + 1), NEG, f32)  # gap consuming B
    tb = np.zeros((la + 1, lb + 1, 3), np.int8)  # predecessor state per state

    # terminal gaps along the borders
    m[0, 0] = f32(0.0)
    d[1, 0] = term_open
    for i in range(2, la + 1):
        d[i, 0] = f32(d[i - 1, 0] + term_ext)
        tb[i, 0, 1] = 1  # continue D
    e[0, 1] = term_open
    for j in range(2, lb + 1):
        e[0, j] = f32(e[0, j - 1] + term_ext)
        tb[0, j, 2] = 2

    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            cands = [m[i - 1, j - 1], d[i - 1, j - 1], e[i - 1, j - 1]]
            src = int(np.argmax(cands))
            m[i, j] = f32(cands[src] + S[i - 1, j - 1])
            tb[i, j, 0] = src

            go = term_open if j == lb else open_
            ge = term_ext if j == lb else ext
            dm = f32(m[i - 1, j] + go)
            dd = f32(d[i - 1, j] + ge)
            if dm >= dd:
                d[i, j] = dm
                tb[i, j, 1] = 0
            else:
                d[i, j] = dd
                tb[i, j, 1] = 1
            go = term_open if i == la else open_
            ge = term_ext if i == la else ext
            em = f32(m[i, j - 1] + go)
            ee = f32(e[i, j - 1] + ge)
            if em >= ee:
                e[i, j] = em
                tb[i, j, 2] = 0
            else:
                e[i, j] = ee
                tb[i, j, 2] = 2

    finals = [m[la, lb], d[la, lb], e[la, lb]]
    state = int(np.argmax(finals))
    score = float(finals[state])
    path = []
    i, j = la, lb
    while i > 0 or j > 0:
        if state == 0:
            if i == 0 or j == 0:
                break
            path.append("M")
            nxt = int(tb[i, j, 0])
            i -= 1
            j -= 1
            state = nxt
        elif state == 1:
            if i == 0:
                break
            path.append("D")
            nxt = int(tb[i, j, 1])
            i -= 1
            state = nxt
        else:
            if j == 0:
                break
            path.append("I")
            nxt = int(tb[i, j, 2])
            j -= 1
            state = nxt
    path.reverse()
    return score, "".join(path)
