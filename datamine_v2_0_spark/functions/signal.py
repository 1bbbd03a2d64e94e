"""Pure-NumPy signal kernels used inside pandas UDFs.

- PELT change-point detection (Killick, Fearnhead & Eckley 2012, public
  algorithm) with the l2 cost — replaces the reference's
  ``ruptures.Pelt(model='l2', min_size=10, jump=1).predict(pen=0.05)``
  (`STEP 5 - CPD/05_cpd_orchestrator_polars.py:66-70,318-330`); ruptures is
  not in this container, so the exact dynamic program is implemented here.
  If ruptures IS importable we delegate to it (bit-identical objective).
- Savitzky–Golay smoothing (classic least-squares polynomial filter) —
  replaces ``scipy.signal.savgol_filter`` with 'interp' edge handling
  (`STEP 2.1 - LD Event Labeling/02.1.3_train_xgboost_model.py:156-158`).
"""

from __future__ import annotations

import numpy as np

try:  # optional accelerator; same objective either way
    import ruptures as _rpt  # type: ignore
except ImportError:  # pragma: no cover - container has no ruptures
    _rpt = None


def _l2_cumsums(x: np.ndarray):
    x = np.asarray(x, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    cs = np.vstack([np.zeros((1, x.shape[1])), np.cumsum(x, axis=0)])
    cs2 = np.vstack([np.zeros((1, x.shape[1])), np.cumsum(x * x, axis=0)])
    return cs, cs2


def _l2_cost(cs, cs2, starts: np.ndarray, end: int) -> np.ndarray:
    """Vectorized l2 segment cost C(s, end) = Σ_dim (Σx² − (Σx)²/len)."""
    seg_len = (end - starts).astype(np.float64)[:, None]
    s1 = cs[end] - cs[starts]
    s2 = cs2[end] - cs2[starts]
    return (s2 - s1 * s1 / seg_len).sum(axis=1)


def pelt_l2(signal: np.ndarray, penalty: float, min_size: int = 10, jump: int = 1) -> list[int]:
    """Exact PELT with l2 cost. Returns interior breakpoints (sorted end
    indices of segments, EXCLUDING the trailing n) — i.e. ruptures'
    ``predict()`` output with the last element dropped, matching the
    reference's "drop trailing index" step
    (`05_cpd_orchestrator_polars.py:330-340`)."""
    x = np.asarray(signal, dtype=np.float64)
    n = x.shape[0]
    if n < 2 * min_size:
        return []
    if _rpt is not None:
        algo = _rpt.Pelt(model="l2", min_size=min_size, jump=jump).fit(
            x if x.ndim > 1 else x.reshape(-1, 1)
        )
        return [int(b) for b in algo.predict(pen=penalty)[:-1]]

    cs, cs2 = _l2_cumsums(x)
    # admissible indices: multiples of jump (plus n itself)
    ends = [t for t in range(min_size, n + 1) if (t % jump == 0 or t == n)]
    F = {0: -float(penalty)}
    prev = {0: 0}
    cands = [0]
    for t in ends:
        starts = np.array([s for s in cands if t - s >= min_size], dtype=np.int64)
        if starts.size == 0:
            continue
        costs = np.array([F[s] for s in starts]) + _l2_cost(cs, cs2, starts, t) + penalty
        i = int(np.argmin(costs))
        F[t] = float(costs[i])
        prev[t] = int(starts[i])
        # prune: keep s with F[s] + C(s,t) <= F[t]
        keep_mask = (costs - penalty) <= F[t]
        kept = set(starts[keep_mask].tolist())
        cands = [s for s in cands if (s in kept or t - s < min_size)]
        cands.append(t)
    if n not in prev:
        return []
    bkps: list[int] = []
    t = n
    while t > 0:
        s = prev[t]
        if s > 0:
            bkps.append(s)
        t = s
    return sorted(bkps)


def savgol_coeffs(window: int, polyorder: int) -> np.ndarray:
    """Least-squares smoothing coefficients evaluated at the window center."""
    if window % 2 == 0:
        raise ValueError("window must be odd")
    m = window // 2
    pos = np.arange(-m, m + 1, dtype=np.float64)
    A = np.vander(pos, polyorder + 1, increasing=True)
    return np.linalg.pinv(A)[0]


def savgol_filter(y: np.ndarray, window: int, polyorder: int) -> np.ndarray:
    """Savitzky–Golay smoothing with polynomial-fit edge handling
    (scipy's ``mode='interp'`` semantics)."""
    y = np.asarray(y, dtype=np.float64)
    n = y.shape[0]
    window = min(window, n if n % 2 == 1 else n - 1)
    if window <= polyorder:
        return y.copy()
    m = window // 2
    if m == 0:
        # window=1: the identity filter — and out[-0:] below would slice
        # the WHOLE array, overwriting everything with the tail fit
        return y.copy()
    c = savgol_coeffs(window, polyorder)
    out = np.convolve(y, c[::-1], mode="same")
    # edges: fit a polynomial to the first/last `window` samples and evaluate
    idx = np.arange(window, dtype=np.float64)
    head = np.polyfit(idx, y[:window], polyorder)
    out[:m] = np.polyval(head, idx[:m])
    tail = np.polyfit(idx, y[-window:], polyorder)
    out[-m:] = np.polyval(tail, idx[-m:])
    return out
