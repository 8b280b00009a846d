from .media import (
    MEDIA_META_SCHEMA,
    attach_fake_media,
    attach_fake_ppm,
    attach_fake_wav,
    audio_frame_features,
    audio_sample_features,
    media_byte_features,
    media_char_features,
    decode_audio_batch,
    decode_image_batch,
    extract_frames_batch,
    resize_image_batch,
)

__all__ = [
    "MEDIA_META_SCHEMA",
    "attach_fake_media",
    "attach_fake_ppm",
    "attach_fake_wav",
    "audio_frame_features",
    "audio_sample_features",
    "media_byte_features",
    "media_char_features",
    "decode_audio_batch",
    "decode_image_batch",
    "extract_frames_batch",
    "resize_image_batch",
]
