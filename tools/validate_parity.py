#!/usr/bin/env python
"""Parity gate: score generated audio against reference outputs.

Usage: python tools/validate_parity.py ours.wav reference.wav [--threshold 0.99]

Computes the BASELINE.json criterion (magnitude-STFT spectral correlation >= threshold)
plus SNR, for matched-seed outputs once real checkpoints are available on both frameworks.
Exit code 0 iff the gate passes.
"""

import argparse
import os
import sys
import wave

import numpy as np

# script-style execution: make the repo root importable
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def read_wav(path: str) -> tuple:
    with wave.open(path) as f:
        sr = f.getframerate()
        pcm = np.frombuffer(f.readframes(f.getnframes()), "<i2")
        pcm = pcm.reshape(-1, f.getnchannels()).mean(axis=1)
    return pcm.astype(np.float32) / 32767.0, sr


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("ours")
    p.add_argument("reference")
    p.add_argument("--threshold", type=float, default=0.99)
    args = p.parse_args(argv)

    from foley_tpu.utils.metrics import snr_db, spectral_correlation

    ours, sr_a = read_wav(args.ours)
    ref, sr_b = read_wav(args.reference)
    if sr_a != sr_b:
        print(f"sample-rate mismatch: {sr_a} vs {sr_b}", file=sys.stderr)
        return 2
    corr = spectral_correlation(ours, ref)
    snr = snr_db(ours, ref)
    ok = corr >= args.threshold
    print(f"spectral_correlation={corr:.5f} (threshold {args.threshold}) snr_db={snr:.2f} "
          f"-> {'PASS' if ok else 'FAIL'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
