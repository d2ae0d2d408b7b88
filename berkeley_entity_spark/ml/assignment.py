"""Optimal 1:1 assignment (Hungarian algorithm) — the per-document entity
alignment CEAFe needs (Luo 2005 phi4; the reference's headline CoNLL score
averages MUC + B3 + CEAFe, coref/CorefConllScorer.scala:72-88, which shells
out to the scorer v7's Algorithm::Munkres).  scipy is not in the sandbox,
so this is a self-contained O(n^3) shortest-augmenting-path implementation
(the Jonker-Volgenant potential form), maximizing, rectangular-safe.

Matrices here are per-document (pred clusters x gold clusters) — tens of
rows at most — so a numpy driver-side kernel inside the Arrow groupBy is
the right tool; nothing about the assignment needs the cluster.
"""

from __future__ import annotations

import numpy as np


def hungarian_max(score: np.ndarray) -> tuple[float, list[tuple[int, int]]]:
    """Maximum-weight 1:1 assignment of a (possibly rectangular) score
    matrix.  Returns (total score, [(row, col), ...]) using at most
    min(n_rows, n_cols) pairs; all scores must be finite.  Unmatched
    rows/cols contribute 0 (CEAFe semantics: phi4 >= 0, so leaving a pair
    unmatched is never better than matching it, and padding with zeros is
    exact)."""
    score = np.asarray(score, dtype=np.float64)
    if score.ndim != 2 or score.size == 0:
        return 0.0, []
    nr, nc = score.shape
    n = max(nr, nc)
    # pad to square with zeros; minimize cost = (max - score)
    cost = np.full((n, n), float(score.max()), dtype=np.float64)
    cost[:nr, :nc] = score.max() - score
    # shortest augmenting path with row/col potentials (1-indexed scratch)
    INF = np.inf
    u = np.zeros(n + 1)
    v = np.zeros(n + 1)
    p = np.zeros(n + 1, dtype=np.int64)  # p[j] = row assigned to col j
    way = np.zeros(n + 1, dtype=np.int64)
    for i in range(1, n + 1):
        p[0] = i
        j0 = 0
        minv = np.full(n + 1, INF)
        used = np.zeros(n + 1, dtype=bool)
        while True:
            used[j0] = True
            i0, delta, j1 = p[j0], INF, 0
            for j in range(1, n + 1):
                if used[j]:
                    continue
                cur = cost[i0 - 1, j - 1] - u[i0] - v[j]
                if cur < minv[j]:
                    minv[j] = cur
                    way[j] = j0
                if minv[j] < delta:
                    delta = minv[j]
                    j1 = j
            for j in range(n + 1):
                if used[j]:
                    u[p[j]] += delta
                    v[j] -= delta
                else:
                    minv[j] -= delta
            j0 = j1
            if p[j0] == 0:
                break
        while j0:
            j1 = way[j0]
            p[j0] = p[j1]
            j0 = j1
    pairs = []
    total = 0.0
    for j in range(1, n + 1):
        r, c = int(p[j]) - 1, j - 1
        if r < nr and c < nc:
            pairs.append((r, c))
            total += float(score[r, c])
    return total, pairs
