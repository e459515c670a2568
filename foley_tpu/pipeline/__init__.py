from foley_tpu.pipeline.features import (
    TEXT_BUCKETS,
    pad_or_trim_time,
    pick_text_bucket,
    prepare_cfg_features,
    resample_frames,
    t2a_features,
)

__all__ = [
    "TEXT_BUCKETS",
    "pad_or_trim_time",
    "pick_text_bucket",
    "prepare_cfg_features",
    "resample_frames",
    "t2a_features",
]
