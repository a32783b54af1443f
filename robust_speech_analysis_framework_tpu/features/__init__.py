from .wav2vec2 import (
    Wav2Vec2Extractor,
    extract_wav2vec2_sequences,
    extract_wav2vec2_embeddings,
)

__all__ = [
    "Wav2Vec2Extractor",
    "extract_wav2vec2_sequences",
    "extract_wav2vec2_embeddings",
]
