"""Training-data pipeline operators (dedup, similarity, text analysis,
multimodal) — SURVEY.md additions beyond the reference's scope."""

from .dialect import DUCK, SPARK, Dialect  # noqa: F401
from .multimodal import (  # noqa: F401
    decode_image, fake_decode_features, media_frame, sample_video_frames,
)
from .pipeline import all_pipeline_sql  # noqa: F401
