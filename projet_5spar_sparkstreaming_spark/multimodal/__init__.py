from projet_5spar_sparkstreaming_spark.multimodal.binary import (
    MEDIA_SCHEMA,
    decode_audio_batch,
    decode_image_batch,
    extract_image_features,
    media_metadata,
    sample_video_frames,
)

__all__ = [
    "MEDIA_SCHEMA",
    "decode_audio_batch",
    "decode_image_batch",
    "extract_image_features",
    "media_metadata",
    "sample_video_frames",
]
