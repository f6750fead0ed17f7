"""Trajectory distance kernels (NumPy, Arrow-batched).

The reference implements these as Scala object code over Array[Point]
(SURVEY.md §2.1 R12-R14; [P §2]); here they are vectorized NumPy kernels
invoked per candidate pair inside ``applyInPandas`` — the Python hop is
paid only for the order-sensitive DP kernels (Fréchet, DTW) that SQL
cannot express; Hausdorff additionally has a pure-SQL twin
(``operators/trajectory.py``) because it is order-insensitive.

Series are 1-D float arrays (the fixtures' ``value`` coordinate; see
FIXTURES.md "trajectory derivation"). The kernels generalize to 2-D by
replacing ``|a-b|`` with row-wise Euclidean distance on an (n,2) array —
the DP recurrences are unchanged.
"""

from __future__ import annotations

import numpy as np


#: dense-matrix cell bound for the pair kernels: a heavy-tailed user at
#: scale fails loudly here (~1 GiB of float64) instead of OOMing an
#: executor (the extras2 segment-kernel discipline)
_MAX_DP_CELLS = 1 << 27


def pairwise_dist(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """|a_i - b_j| matrix for 1-D series, Euclidean for (n,d) series."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    if a.shape[0] * b.shape[0] > _MAX_DP_CELLS:
        raise ValueError(
            f"pair matrix {a.shape[0]}x{b.shape[0]} exceeds the kernel "
            f"cell bound ({_MAX_DP_CELLS})"
        )
    if a.ndim == 1:
        return np.abs(a[:, None] - b[None, :])
    diff = a[:, None, :] - b[None, :, :]
    return np.sqrt((diff * diff).sum(axis=2))


def hausdorff(a: np.ndarray, b: np.ndarray) -> float:
    """Symmetric Hausdorff distance H(A,B)=max(h(A,B), h(B,A)) with
    h(A,B)=max_a min_b d(a,b)  [P §2]."""
    d = pairwise_dist(a, b)
    return float(max(d.min(axis=1).max(), d.min(axis=0).max()))


def _antidiagonal_dp(
    d: np.ndarray, is_frechet: bool, tau: float | None = None
) -> float:
    """Shared DP engine, vectorized along antidiagonals.

    Cell (i,j) depends only on antidiagonals k-1 ((i-1,j), (i,j-1)) and
    k-2 ((i-1,j-1)), so each antidiagonal is one NumPy expression —
    O(n+m) array ops instead of O(n*m) Python-loop iterations (~50x on
    100-point series). Arrays are length n+1 with position p = i+1 and an
    inf sentinel at p=0, so the i-1 accesses never need bounds checks.

    ``tau`` enables early abandon (reference O10, [P §4.4]): a monotone
    coupling path can SKIP a single antidiagonal (the diagonal step
    jumps from k-1 to k+1) but never two in a row, so every path
    touches at least one of any two CONSECUTIVE antidiagonals; DP
    values are lower bounds on any completion through them. Once the
    minima of two consecutive antidiagonals both exceed tau, the final
    value must too — return the smaller minimum (a valid lower bound
    > tau, NOT the exact distance). The start cell (0,0) lies on every
    path, so d[0,0] > tau abandons immediately.
    """
    n, m = d.shape
    inf = np.inf
    prev2 = np.full(n + 1, inf)  # antidiagonal k-2, prev2[i+1] = value at i
    prev1 = np.full(n + 1, inf)  # antidiagonal k-1
    prev1[1] = d[0, 0]
    if n == 1 and m == 1:
        return float(d[0, 0])
    if tau is not None and d[0, 0] > tau:
        return float(d[0, 0])
    prev_min = float(d[0, 0])  # min DP value on antidiagonal k-1
    for k in range(1, n + m - 1):
        lo = max(0, k - m + 1)
        hi = min(k, n - 1)
        idx = np.arange(lo, hi + 1)
        dk = d[idx, k - idx]
        best = np.minimum(
            np.minimum(prev1[idx], prev1[idx + 1]), prev2[idx]
        )  # (i-1,j), (i,j-1), (i-1,j-1)
        vals = np.maximum(dk, best) if is_frechet else dk + best
        if tau is not None:
            mn = float(vals.min())
            if mn > tau and prev_min > tau:
                return min(mn, prev_min)
            prev_min = mn
        cur = np.full(n + 1, inf)
        cur[idx + 1] = vals
        prev2, prev1 = prev1, cur
    return float(prev1[n])


def frechet(
    a: np.ndarray, b: np.ndarray, tau: float | None = None
) -> float:
    """Discrete Fréchet distance via the classic DP:
    dF(i,j) = max(d(a_i,b_j), min(dF(i-1,j), dF(i,j-1), dF(i-1,j-1)))
    [P §2], evaluated antidiagonal-vectorized. With ``tau`` set, returns
    early with a lower bound whenever the true distance provably exceeds
    tau (exact otherwise)."""
    return _antidiagonal_dp(pairwise_dist(a, b), is_frechet=True, tau=tau)


def dtw(a: np.ndarray, b: np.ndarray, tau: float | None = None) -> float:
    """Dynamic time warping cost (sum-of-distances variant):
    dtw(i,j) = d(a_i,b_j) + min(dtw(i-1,j), dtw(i,j-1), dtw(i-1,j-1)).
    Not a metric (no triangle inequality) — R14. The tau early-abandon
    argument is as valid here as for Fréchet: partial sums are
    non-decreasing along any path (distances are non-negative), so DP
    values lower-bound every completion."""
    return _antidiagonal_dp(pairwise_dist(a, b), is_frechet=False, tau=tau)


def _seg_dist(x: np.ndarray, y: np.ndarray, i: int, j: int) -> np.ndarray:
    """Perpendicular distance of points i+1..j-1 from chord (i, j);
    falls back to distance-to-point when the chord is degenerate."""
    px, py = x[i + 1 : j], y[i + 1 : j]
    dx, dy = x[j] - x[i], y[j] - y[i]
    # explicit sqrt(dx^2+dy^2), NOT np.hypot: hypot's overflow-safe
    # algorithm differs from SQL's SQRT(a*a+b*b) by ulps, and the
    # recursive-CTE oracle must reproduce the argmax bit-for-bit
    norm = np.sqrt(dx * dx + dy * dy)
    if norm == 0.0:
        ex, ey = px - x[i], py - y[i]
        return np.sqrt(ex * ex + ey * ey)
    return np.abs(dy * (px - x[i]) - dx * (py - y[i])) / norm


def douglas_peucker(x: np.ndarray, y: np.ndarray, tol: float) -> np.ndarray:
    """Douglas-Peucker simplification: indices (sorted, ascending) of
    the kept points of polyline (x, y) such that every dropped point is
    within ``tol`` of the kept chord spanning it. Endpoints always kept.
    Iterative explicit stack (no recursion limit), deterministic: the
    split point is the FIRST farthest point (argmax ties -> lowest
    index)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = x.shape[0]
    if n <= 2:
        return np.arange(n)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j - i < 2:
            continue
        d = _seg_dist(x, y, i, j)
        k = int(np.argmax(d))
        if d[k] > tol:
            split = i + 1 + k
            keep[split] = True
            stack.append((i, split))
            stack.append((split, j))
    return np.flatnonzero(keep)


def dtw_banded(
    a: np.ndarray, b: np.ndarray, w: int = 8, tau: float | None = None
) -> float:
    """Sakoe-Chiba BANDED DTW: the classic constrained-alignment kernel
    — only couplings with |i - j| <= w are admissible (w widened to
    |n - m| so the end corner stays reachable). Banded cost >= exact
    DTW (restricting the path set can only raise the minimum), so every
    SQL lower bound that gates exact DTW gates the banded kernel too.

    Unlike the exact engine, BOTH the DP and the distance evaluations
    are band-local: each antidiagonal clips its index range to
    |2i - k| <= w and gathers only those |a_i - b_j| values — O(n * w)
    total work and memory instead of O(n * m), the reason banded DTW is
    the long-series scale variant. The tau early-abandon argument from
    ``_antidiagonal_dp`` carries over unchanged (band paths touch one
    of any two consecutive antidiagonals)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    n, m = len(a), len(b)
    weff = max(w, abs(n - m))

    if a.ndim == 1:
        def dist(idx: np.ndarray, jdx: np.ndarray) -> np.ndarray:
            return np.abs(a[idx] - b[jdx])
    else:
        def dist(idx: np.ndarray, jdx: np.ndarray) -> np.ndarray:
            diff = a[idx] - b[jdx]
            return np.sqrt((diff * diff).sum(axis=1))

    d00 = float(dist(np.array([0]), np.array([0]))[0])
    if n == 1 and m == 1:
        return d00
    if tau is not None and d00 > tau:
        return d00
    inf = np.inf
    prev2 = np.full(n + 1, inf)
    prev1 = np.full(n + 1, inf)
    prev1[1] = d00
    prev_min = d00
    for k in range(1, n + m - 1):
        lo = max(0, k - m + 1, (k - weff + 1) // 2)  # ceil((k - w) / 2)
        hi = min(k, n - 1, (k + weff) // 2)
        if lo > hi:  # unreachable for weff >= |n - m|; guard anyway
            prev2, prev1 = prev1, np.full(n + 1, inf)
            continue
        idx = np.arange(lo, hi + 1)
        dk = dist(idx, k - idx)
        best = np.minimum(
            np.minimum(prev1[idx], prev1[idx + 1]), prev2[idx]
        )
        vals = dk + best
        if tau is not None:
            mn = float(vals.min())
            if mn > tau and prev_min > tau:
                return min(mn, prev_min)
            prev_min = mn
        cur = np.full(n + 1, inf)
        cur[idx + 1] = vals
        prev2, prev1 = prev1, cur
    return float(prev1[n])


def lcss(
    a: np.ndarray, b: np.ndarray, eps: float, delta: int | None = None
) -> int:
    """Longest common subsequence length under eps-matching
    (LCSS_{eps}, the third classic trajectory measure after Fréchet
    and DTW): L(i,j) = L(i-1,j-1)+1 if d(a_i,b_j) <= eps else
    max(L(i-1,j), L(i,j-1)).  Integer-valued, so exact by
    construction; the similarity display is LCSS/min(n,m).

    Antidiagonal-vectorized like ``_antidiagonal_dp``, using the
    equivalent monotone form L(i,j) = max(L(i-1,j-1)+m_ij, L(i-1,j),
    L(i,j-1)) (valid because L grows by at most 1 per added element,
    so the NW+1 candidate dominates on a match and never wins
    spuriously otherwise).

    ``delta`` adds the Vlachos time-window constraint (LCSS_{d,e}):
    a match additionally requires |i - j| <= delta; gap moves stay
    unrestricted, so the constrained measure is the plain recurrence
    over a band-masked match matrix."""
    d = pairwise_dist(a, b)
    match = (d <= eps).astype(np.int64)
    if delta is not None:
        match = _band_mask(match, delta)
    return _lcss_dp(match)


def _band_mask(match: np.ndarray, delta: int) -> np.ndarray:
    """Zero out match cells outside the |i - j| <= delta time window."""
    n_, m_ = match.shape
    ii = np.arange(n_)[:, None]
    jj = np.arange(m_)[None, :]
    return match & (np.abs(ii - jj) <= delta).astype(np.int64)


def lcss_int2d(
    aq: np.ndarray, bq: np.ndarray, e2: int, delta: int | None = None
) -> int:
    """LCSS over 2-D INTEGER (micro-quantized) points: the match
    decision is the exact integer comparison (ax-bx)^2 + (ay-by)^2 <=
    e2 — no sqrt, no float anywhere, so the 2-D row's oracle mirrors
    it verbatim.  ``aq``/``bq`` are (n, 2) int64 arrays."""
    aq = np.asarray(aq, dtype=np.int64)
    bq = np.asarray(bq, dtype=np.int64)
    diff = aq[:, None, :] - bq[None, :, :]
    d2 = (diff * diff).sum(axis=2)
    match = (d2 <= e2).astype(np.int64)
    if delta is not None:
        match = _band_mask(match, delta)
    return _lcss_dp(match)


def _lcss_dp(match: np.ndarray) -> int:
    n, m = match.shape
    prev2 = np.full(n + 1, -1, dtype=np.int64)  # k-2 diag; p = i+1
    prev1 = np.full(n + 1, -1, dtype=np.int64)  # k-1 diag
    prev1[1] = match[0, 0]
    if n == 1 and m == 1:
        return int(match[0, 0])
    for k in range(1, n + m - 1):
        lo = max(0, k - m + 1)
        hi = min(k, n - 1)
        idx = np.arange(lo, hi + 1)
        mk = match[idx, k - idx]
        # virtual zero row/col: boundary cells see NW = 0
        nw = np.where(prev2[idx] < 0, 0, prev2[idx])
        best = np.maximum(
            np.maximum(prev1[idx], prev1[idx + 1]), nw + mk
        )
        cur = np.full(n + 1, -1, dtype=np.int64)
        cur[idx + 1] = best
        prev2, prev1 = prev1, cur
    return int(prev1[n])


def edr(a: np.ndarray, b: np.ndarray, eps: float) -> int:
    """Edit Distance on Real sequences (EDR_{eps}): E(i,j) =
    min(E(i-1,j-1) + (0 if d(a_i,b_j) <= eps else 1), E(i-1,j) + 1,
    E(i,j-1) + 1) with E(i,0)=i, E(0,j)=j.  Integer-valued — exact by
    construction.  Antidiagonal-vectorized with virtual boundary
    candidates (row 0 / col 0 are arithmetic, never materialized)."""
    d = pairwise_dist(a, b)
    return _edr_dp((d > eps).astype(np.int64))


def edr_int2d(aq: np.ndarray, bq: np.ndarray, e2: int) -> int:
    """EDR over 2-D INTEGER (micro-quantized) points: substitution is
    free iff (ax-bx)^2 + (ay-by)^2 <= e2 — the exact integer decision
    the 2-D oracle mirrors verbatim."""
    aq = np.asarray(aq, dtype=np.int64)
    bq = np.asarray(bq, dtype=np.int64)
    diff = aq[:, None, :] - bq[None, :, :]
    d2 = (diff * diff).sum(axis=2)
    return _edr_dp((d2 > e2).astype(np.int64))


def _edr_dp(sub: np.ndarray) -> int:
    n, m = sub.shape
    big = np.int64(1 << 40)
    prev2 = np.full(n + 1, big, dtype=np.int64)
    prev1 = np.full(n + 1, big, dtype=np.int64)
    prev1[1] = sub[0, 0]  # E(1,1) = min(0+sub, 1+1, 1+1) = sub
    if n == 1 and m == 1:
        return int(sub[0, 0])
    for k in range(1, n + m - 1):
        lo = max(0, k - m + 1)
        hi = min(k, n - 1)
        idx = np.arange(lo, hi + 1)  # i-1 (0-based row)
        sk = sub[idx, k - idx]
        jdx = k - idx  # j-1 (0-based col)
        nw = prev2[idx].copy()
        nn = prev1[idx].copy()
        ww = prev1[idx + 1].copy()
        # virtual boundaries (1-based i = idx+1, j = jdx+1):
        # i == 1: NW = E(0, j-1) = j-1, N = E(0, j) = j
        first_row = idx == 0
        nw[first_row] = jdx[first_row]
        nn[first_row] = jdx[first_row] + 1
        # j == 1: NW = E(i-1, 0) = i-1, W = E(i, 0) = i
        first_col = jdx == 0
        nw[first_col] = idx[first_col]
        ww[first_col] = idx[first_col] + 1
        best = np.minimum(np.minimum(nn + 1, ww + 1), nw + sk)
        cur = np.full(n + 1, big, dtype=np.int64)
        cur[idx + 1] = best
        prev2, prev1 = prev1, cur
    return int(prev1[n])


def isqrt_i64(x: np.ndarray) -> np.ndarray:
    """Exact integer floor-sqrt of non-negative int64 values: float
    sqrt candidate corrected by +-1 with EXACT integer comparisons
    (the SQL-mirrorable form — float sqrt of x <= 2^63 errs by < 1, so
    one correction step suffices on both engines)."""
    x = np.asarray(x, dtype=np.int64)
    cap = 3_037_000_499  # isqrt(2^63 - 1): keeps every square in int64
    s = np.clip(np.sqrt(x.astype(np.float64)).astype(np.int64), 0, cap)
    sp = np.where(s < cap, s + 1, s)
    s = np.where(sp * sp <= x, sp, s)
    return np.where((s > 0) & (s * s > x), s - 1, s)


def erp(a: np.ndarray, b: np.ndarray) -> int:
    """ERP (Edit distance with Real Penalty, gap g = 0) over INTEGER
    (micro-quantized) series: E(i,j) = min(E(i-1,j-1) + |a_i - b_j|,
    E(i-1,j) + |a_i|, E(i,j-1) + |b_j|) with E(i,0) = prefix|a|,
    E(0,j) = prefix|b|.  Unlike DTW, ERP is a METRIC (triangle
    inequality holds) — the property the quantized-integer form
    preserves exactly.  Integer in, integer out: no float anywhere, so
    the antidiagonal NumPy evaluation and the DuckDB recursive CTE
    agree bit-for-bit (and DuckDB's windowed-sum combine order cannot
    matter for the boundary prefixes)."""
    a = np.asarray(a, dtype=np.int64)
    b = np.asarray(b, dtype=np.int64)
    d = np.abs(a[:, None] - b[None, :])
    return _erp_dp(d, np.abs(a), np.abs(b))


def erp_int2d(aq: np.ndarray, bq: np.ndarray) -> int:
    """ERP over 2-D INTEGER (micro-quantized) points, gap g = origin:
    match cost isqrt(dx^2 + dy^2), gap cost isqrt(px^2 + py^2) — the
    floor-sqrt keeps every DP cell a BIGINT, so the custom cells CTE
    mirrors it exactly (same +-1-corrected isqrt in SQL).  ``aq``/``bq``
    are (n, 2) int64 arrays."""
    aq = np.asarray(aq, dtype=np.int64)
    bq = np.asarray(bq, dtype=np.int64)
    diff = aq[:, None, :] - bq[None, :, :]
    d = isqrt_i64((diff * diff).sum(axis=2))
    ca = isqrt_i64((aq * aq).sum(axis=1))
    cb = isqrt_i64((bq * bq).sum(axis=1))
    return _erp_dp(d, ca, cb)


def _erp_dp(d: np.ndarray, ca: np.ndarray, cb: np.ndarray) -> int:
    """Shared antidiagonal ERP recursion: ``d`` the (n, m) match-cost
    matrix, ``ca``/``cb`` the per-point gap costs (all int64)."""
    pa, pb = np.cumsum(ca), np.cumsum(cb)
    n, m = d.shape
    big = np.int64(1 << 60)
    prev2 = np.full(n + 1, big, dtype=np.int64)
    prev1 = np.full(n + 1, big, dtype=np.int64)
    prev1[1] = min(int(d[0, 0]), int(ca[0] + cb[0]))
    if n == 1 and m == 1:
        return int(prev1[1])
    for k in range(1, n + m - 1):
        lo = max(0, k - m + 1)
        hi = min(k, n - 1)
        idx = np.arange(lo, hi + 1)  # 0-based row i-1
        jdx = k - idx  # 0-based col j-1
        dk = d[idx, jdx]
        nw = prev2[idx].copy()
        nn = prev1[idx].copy()
        ww = prev1[idx + 1].copy()
        first_row = idx == 0
        if first_row.any():
            jj = jdx[first_row]
            nw[first_row] = np.where(jj > 0, pb[jj - 1], 0)
            nn[first_row] = pb[jj]
        first_col = jdx == 0
        if first_col.any():
            ii = idx[first_col]
            nw[first_col] = np.where(ii > 0, pa[ii - 1], 0)
            ww[first_col] = pa[ii]
        best = np.minimum(
            np.minimum(nn + ca[idx], ww + cb[jdx]), nw + dk
        )
        cur = np.full(n + 1, big, dtype=np.int64)
        cur[idx + 1] = best
        prev2, prev1 = prev1, cur
    return int(prev1[n])
