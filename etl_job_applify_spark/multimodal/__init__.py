from .media import (
    MEDIA_META_SCHEMA,
    attach_fake_media,
    attach_fake_ppm,
    media_byte_features,
    media_char_features,
    decode_image_batch,
    extract_frames_batch,
    resize_image_batch,
)

__all__ = [
    "MEDIA_META_SCHEMA",
    "attach_fake_media",
    "attach_fake_ppm",
    "media_byte_features",
    "media_char_features",
    "decode_image_batch",
    "extract_frames_batch",
    "resize_image_batch",
]
