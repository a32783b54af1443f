from .corpus import load_androids_corpus, parse_androids_filename
from .aggregate import aggregate_clip_features, aggregate_interview_sequences

__all__ = [
    "load_androids_corpus",
    "parse_androids_filename",
    "aggregate_clip_features",
    "aggregate_interview_sequences",
]
