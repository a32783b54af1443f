"""Frame-count bucketing for the jitted DSP ops.

Every jitted frame-parallel op compiles per input shape; a corpus of
variable-length files would otherwise trigger a fresh XLA compilation per
file. Padding the frame axis up to a geometric ladder of bucket sizes
bounds compilation count to O(log T_max) per op while the padded tail
(edge-replicated frames, so sequential consumers like Viterbi see a
continuation of the last real frame rather than a discontinuity) is sliced
away from the results.
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np

_MIN_BUCKET = 64
_GROWTH = 1.5


def bucket_size(n: int, min_bucket: int = _MIN_BUCKET, growth: float = _GROWTH) -> int:
    if n <= min_bucket:
        return min_bucket
    k = math.ceil(math.log(n / min_bucket) / math.log(growth))
    return int(math.ceil(min_bucket * growth**k))


def bucket_size_files(n: int, growth: float = _GROWTH) -> int:
    """Bucket ladder for *file counts* (min bucket 1, not 64): bounds the
    number of distinct batch dims the vmapped per-file ops compile for."""
    if n <= 1:
        return 1
    k = math.ceil(math.log(n) / math.log(growth))
    return int(math.ceil(growth**k))


def pad_frames(frames: np.ndarray, axis: int = 0) -> Tuple[np.ndarray, int]:
    """Pad ``frames`` along ``axis`` to its bucket size by edge replication.

    Returns (padded, true_count). No-op (but still returns) when the count
    is already on a bucket boundary.
    """
    n = frames.shape[axis]
    target = bucket_size(n)
    if target == n:
        return frames, n
    pad_widths = [(0, 0)] * frames.ndim
    pad_widths[axis] = (0, target - n)
    return np.pad(frames, pad_widths, mode="edge"), n
