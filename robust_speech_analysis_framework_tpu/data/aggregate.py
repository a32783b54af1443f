"""Session-level aggregation of clip features and sequences.

Parity target: reference `src/utils.py` — `aggregate_clip_features` (:7) and
`aggregate_interview_sequences` (:61). Interview audio arrives as many short
clips per participant; summary-feature classifiers want one (mean, std) vector
per participant and sequence models want one concatenated sequence.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np
import pandas as pd


def aggregate_clip_features(
    clip_features_df: pd.DataFrame, metadata_df: pd.DataFrame
) -> pd.DataFrame:
    """Collapse clip-level features to one row per participant.

    Each feature column becomes two columns ``<name>_mean`` / ``<name>_std``
    (std with pandas' default ddof=1), computed over all of a participant's
    clips; clips are linked to participants via ``filename`` →
    ``unique_participant_id`` in ``metadata_df``. Matches reference
    src/utils.py:36-58 (including the doubled feature dimensionality:
    25→50, 911→1822, 768→1536).
    """
    if clip_features_df.empty or metadata_df.empty:
        return pd.DataFrame()
    keys = metadata_df[["filename", "unique_participant_id"]]
    merged = keys.merge(clip_features_df, on="filename").drop(columns=["filename"])
    agg = merged.groupby("unique_participant_id").agg(["mean", "std"])
    agg.columns = ["_".join(col).strip() for col in agg.columns.to_flat_index()]
    return agg.reset_index().copy()


def aggregate_interview_sequences(
    clip_sequences: Mapping[str, np.ndarray], interview_metadata_df: pd.DataFrame
) -> Dict[str, np.ndarray]:
    """Concatenate each participant's clip sequences into one (T, D) array.

    Clips missing from ``clip_sequences`` (failed extraction / too short) are
    skipped; participants with no surviving clips are omitted, matching
    reference src/utils.py:81-96. Concatenation follows metadata row order.
    """
    if interview_metadata_df.empty:
        return {}
    by_participant = interview_metadata_df.groupby("unique_participant_id")[
        "filename"
    ].apply(list)
    out: Dict[str, np.ndarray] = {}
    for pid, clip_names in by_participant.items():
        parts = [clip_sequences[n] for n in clip_names if n in clip_sequences]
        if parts:
            out[pid] = np.vstack(parts)
    return out
