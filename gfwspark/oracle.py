"""Numpy reference semantics — the golden-vector oracle (SURVEY.md §5).

Independent re-implementations (from the reference's documented
behavior, not its code) of the window kernels the engine must match
`np.allclose` at every entity×timestamp:

- ``repeat_pad``           ~ np_pad_repeat_slice (feature_utilities.py:26-45)
- ``sliding_slices``       ~ np_array_extract_all_fixed_slices (:350-368)
- ``dense_interval_labels``~ add_labels fill (fishing_feature_generation.py:52-68)
- ``asof_backward``        ~ backward-only point-in-time lookup
- ``session_ids``          ~ gap-based sessionization (objectives.py:340-380)

All operate on per-entity numpy arrays sorted ascending by timestamp —
the reference's core invariant (feature_utilities.py:405-407).
"""

from __future__ import annotations

import numpy as np


def repeat_pad(mat: np.ndarray, window_size: int) -> np.ndarray:
    """Tile `mat` (rows = points) until it has `window_size` rows, then
    truncate: np.concatenate([mat]*reps)[:window_size]."""
    if len(mat) >= window_size:
        return mat[-window_size:]
    reps = int(np.ceil(window_size / len(mat)))
    return np.concatenate([mat] * reps, axis=0)[:window_size]


def sliding_slices(
    n: int, window_size: int, shift: int
) -> list[tuple[int, int]]:
    """Index ranges [start, end) of all full windows stepping back from
    the series end by `shift` (reference W1 anchor rule)."""
    out = []
    end = n
    while end - window_size >= 0:
        out.append((end - window_size, end))
        end -= shift
    return sorted(out)


def dense_interval_labels(
    ts: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
    values: np.ndarray,
    default: float = -1.0,
) -> np.ndarray:
    """Engine semantics for point-in-interval labels: each point takes
    the value of the latest-starting interval whose start <= ts, if that
    interval still covers ts (start <= ts <= end, both inclusive);
    `default` otherwise.  Intervals are processed sorted by start."""
    order = np.argsort(starts, kind="mergesort")
    starts, ends, values = starts[order], ends[order], values[order]
    out = np.full(len(ts), default, dtype=np.float64)
    for s, e, v in zip(starts, ends, values):
        mask = (ts >= s) & (ts <= e)
        out[mask] = v
        # latest-starting wins even when it no longer covers: points after
        # its end but >= its start revert to default
        past = (ts > e) & (ts >= s)
        out[past] = default
    return out


def sequential_overwrite_labels(
    ts: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
    values: np.ndarray,
    default: float = -1.0,
) -> np.ndarray:
    """REFERENCE-exact dense labelling (add_labels,
    fishing_feature_generation.py:52-68): intervals sorted by start are
    written sequentially into the dense array, each only inside
    [start, end] — so an enclosing earlier interval keeps its label
    past a nested later one's end.  Equals 'latest-starting interval
    that COVERS the point'.  Equal-start ties resolve to the larger
    value (the engine's deterministic tiebreak; the reference's is
    input-order-dependent)."""
    order = np.lexsort((values, starts))
    out = np.full(len(ts), default, dtype=np.float64)
    for s, e, v in zip(starts[order], ends[order], values[order]):
        out[(ts >= s) & (ts <= e)] = v
    return out


def asof_backward(
    ts: np.ndarray, ann_ts: np.ndarray, ann_val: np.ndarray
) -> np.ndarray:
    """Most recent annotation value with ann_ts <= ts; NaN if none."""
    if len(ann_ts) == 0:
        return np.full(len(ts), np.nan)
    order = np.argsort(ann_ts, kind="mergesort")
    ann_ts, ann_val = ann_ts[order], ann_val[order]
    idx = np.searchsorted(ann_ts, ts, side="right") - 1
    return np.where(idx >= 0, ann_val[np.clip(idx, 0, None)], np.nan)


def session_ids(ts_us: np.ndarray, gap_us: int) -> np.ndarray:
    """0-based session ids: new session when gap to previous > gap_us."""
    if len(ts_us) == 0:
        return np.array([], dtype=np.int64)
    gaps = np.diff(ts_us)
    new = np.concatenate([[1], (gaps > gap_us).astype(np.int64)])
    return np.cumsum(new) - 1


def sliding_mean(x: np.ndarray, window_size: int) -> np.ndarray:
    """Backward rows-frame mean with NaN skipping (matches SQL AVG over
    ROWS BETWEEN w-1 PRECEDING AND CURRENT ROW)."""
    out = np.empty(len(x), dtype=np.float64)
    for i in range(len(x)):
        w = x[max(0, i - window_size + 1) : i + 1]
        w = w[~np.isnan(w)]
        out[i] = w.mean() if len(w) else np.nan
    return out


def aligned_windows_np(
    ts: "np.ndarray",
    mat: "np.ndarray",
    window_size: int,
    shift: int,
    start=None,
    end=None,
    win_start: int = 0,
) -> list["np.ndarray"]:
    """Reference-exact semantics of process_fixed_window_features
    (feature_utilities.py:372-460), independently re-derived in numpy
    as the oracle for windows.aligned_windows.

    Index arithmetic per the reference: win_end = win_start+shift+1,
    pad_end = window_size - win_end, pad_start = win_start; end_i =
    searchsorted(ts, end, 'right') + pad_end; start_i =
    searchsorted(ts, start, 'left') - pad_start, decremented to
    alignment; series tail-padded with mat[-1] when data runs out
    before end_i; when start_i < 0 the head-pad replicas of mat[0]
    are APPENDED AT THE TAIL (the reference's own quirk at
    feature_utilities.py:452), not prepended."""
    n = len(mat)
    if n == 0:
        return []
    win_end = win_start + shift + 1
    assert win_end <= window_size
    pad_end, pad_start = window_size - win_end, win_start
    raw_end_i = int(np.searchsorted(ts, end, side="right")) if end is not None else n
    n_pad_end = max(pad_end - (n - raw_end_i), 0)
    end_i = raw_end_i + pad_end
    raw_start_i = (
        int(np.searchsorted(ts, start, side="left")) if start is not None else 0
    )
    start_i = raw_start_i - pad_start
    if start_i >= n or end_i < 1:
        return []
    start_i -= (window_size + start_i - end_i) % shift
    if n_pad_end > 0:
        mat = np.concatenate([mat, np.repeat(mat[-1:], n_pad_end, axis=0)], axis=0)
    else:
        mat = mat[:end_i]
    if start_i < 0:
        mat = np.concatenate([mat, np.repeat(mat[:1], -start_i, axis=0)], axis=0)
    else:
        mat = mat[start_i:]
    return [
        mat[s : s + window_size]
        for s in range(0, len(mat) - window_size + 1, shift)
    ]


def _md5_draw(entity, idx: int, seed: int) -> int:
    """32-bit uniform draw shared with the engine and the DuckDB oracle
    (sampling._md5_draw): int of the first 8 hex chars of
    md5(f'{entity}:{idx}:{seed}')."""
    import hashlib

    return int(hashlib.md5(f"{entity}:{idx}:{seed}".encode()).hexdigest()[:8], 16)


def range_anchored_starts(
    ts: np.ndarray,
    ranges: list[tuple[float, float]],
    n: int,
    output_length: int,
    entity,
    seed: int,
) -> list[int]:
    """Candidate-start semantics of extract_n_random_fixed_points
    (reference feature_utilities.py:153-206) with the engine's seeded
    deterministic draw over the SORTED candidate list.

    Returns the n chosen 0-based start indices, or [] when the series
    is shorter than output_length or no window overlaps any range."""
    L = output_length
    if len(ts) < L:
        return []
    cand: set[int] = set()
    for start, end in ranges:
        s_ndx = int(np.searchsorted(ts, start, side="left"))
        e_ndx = int(np.searchsorted(ts, end, side="right"))
        lo = max(0, s_ndx - L + 1)
        hi = min(len(ts) - L + 1, e_ndx)
        cand.update(range(lo, hi))
    if not cand:
        return []
    cands = sorted(cand)
    return [cands[_md5_draw(entity, i, seed) % len(cands)] for i in range(n)]


def sampled_time_slices(
    ts_s: np.ndarray,
    n: int,
    max_time_delta: int,
    output_length: int,
    min_timeslice_size: int,
    entity,
    seed: int,
) -> list[tuple[int, int, np.ndarray]]:
    """Start-time and slice semantics of extract_n_random_fixed_times
    (reference feature_utilities.py:246-294) with the engine's seeded
    draw.  ts_s: epoch seconds, sorted.  Returns per sample
    (start_time, start_idx, padded_row_indices of length output_length);
    [] when the entity yields no windows."""
    L, m = output_length, min_timeslice_size
    if len(ts_s) < m:
        return []
    min_time = int(ts_s[0]) - (L - m)
    max_time = int(min(ts_s[len(ts_s) - m], ts_s[-1] - max_time_delta))
    if max_time < min_time:
        return []
    out = []
    for i in range(n):
        start_time = min_time + _md5_draw(entity, i, seed) % (max_time - min_time + 1)
        start_idx = int(np.searchsorted(ts_s, start_time, side="left"))
        real = np.arange(start_idx, min(start_idx + L, len(ts_s)))
        padded = real[np.arange(L) % len(real)]  # np_pad_repeat_slice
        out.append((start_time, start_idx, padded))
    return out


def ffill(x: "np.ndarray") -> "np.ndarray":
    """Forward-fill NaNs with the last non-NaN value."""
    out = x.astype(np.float64).copy()
    last = np.nan
    for i in range(len(out)):
        if np.isnan(out[i]):
            out[i] = last
        else:
            last = out[i]
    return out
