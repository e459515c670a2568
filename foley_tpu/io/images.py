"""Host-side image/frame byte utilities shared by the vision encoders."""

from __future__ import annotations

import numpy as np


def frames_to_u8(frames: np.ndarray) -> np.ndarray:
    """Host-side [0,1] float -> uint8, exactly the PIL preprocessing path's quantization.

    Shipping uint8 quarters the host->device bytes — the dominant V2A cost on tunneled
    runtimes (ROADMAP "V2A end-to-end phase profile")."""
    if frames.dtype == np.uint8:
        return frames
    return (np.clip(frames, 0.0, 1.0) * 255).astype(np.uint8)
