from .wav2vec2 import (
    Wav2Vec2Extractor,
    extract_wav2vec2_sequences,
    extract_wav2vec2_embeddings,
)
from .mshds import FEATURE_NAMES as MSHDS_FEATURE_NAMES, extract_mshds_features
from .opensmile import (
    OpenSmileConfig,
    OpenSmileExtractor,
    extract_opensmile_features,
    feature_columns as opensmile_feature_columns,
)
from .conf_parser import opensmile_config_from_conf, parse_conf

__all__ = [
    "Wav2Vec2Extractor",
    "extract_wav2vec2_sequences",
    "extract_wav2vec2_embeddings",
    "MSHDS_FEATURE_NAMES",
    "extract_mshds_features",
    "OpenSmileConfig",
    "OpenSmileExtractor",
    "extract_opensmile_features",
    "opensmile_feature_columns",
    "opensmile_config_from_conf",
    "parse_conf",
]
