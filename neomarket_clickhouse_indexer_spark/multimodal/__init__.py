from .media import (
    MEDIA_SCHEMA,
    extract_features,
    frame_sample,
    image_stats,
    synthesize_media,
)

__all__ = [
    "MEDIA_SCHEMA",
    "extract_features",
    "frame_sample",
    "image_stats",
    "synthesize_media",
]
