#!/usr/bin/env python
"""Standalone repro of the XLA-TPU ``lhs_dilation`` miscompile (for upstream reporting).

``conv_general_dilated`` with ``lhs_dilation=(3,)`` at the DAC decoder's stage-4 geometry
(K=6, stride s=3, padding=2, output_padding=1 — i.e. effective pad lo=3, hi=4) produces an
output shifted by one sample from index 1 onward on the axon TPU runtime, while the
mathematically identical explicit ``lax.pad`` zero-stuffing + unit-stride conv is correct
(numpy reference included). foley-tpu works around it in
``foley_tpu/ops/nn.py::conv_transpose1d`` (explicit pad / polyphase); run this on each new
runtime drop — if it prints MATCH, the workaround can be retired.

Usage: python tools/repro_lhs_dilation_bug.py   (runs on the default backend)
"""

import sys

import numpy as np


def check(t_in, cin, cout, k=6, s=3, padding=2, output_padding=1):
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, t_in, cin)).astype(np.float32)
    w = rng.normal(size=(k, cin, cout)).astype(np.float32)  # WIO

    # numpy reference: torch-semantics conv_transpose1d
    t_out = (t_in - 1) * s - 2 * padding + (k - 1) + output_padding + 1
    ref = np.zeros((1, t_out + 2 * padding, cout), np.float32)
    for t in range(t_in):
        for kk in range(k):
            ref[0, t * s + kk] += x[0, t] @ w[kk]
    ref = ref[:, padding : padding + t_out]

    pad_lo = k - 1 - padding
    pad_hi = k - 1 - padding + output_padding
    wf = w[::-1]  # flipped taps: conv_transpose(x, w) == conv(dilate(x), flip(w))

    # path A: lhs_dilation (the miscompiled one)
    out_a = lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(wf), window_strides=(1,),
        padding=[(pad_lo, pad_hi)], lhs_dilation=(s,),
        dimension_numbers=("NWC", "WIO", "NWC"), precision=lax.Precision.HIGHEST,
    )
    # path B: explicit zero-stuffing via lax.pad (the workaround)
    x_dil = lax.pad(jnp.asarray(x), jnp.zeros((), jnp.float32),
                    [(0, 0, 0), (pad_lo, pad_hi, s - 1), (0, 0, 0)])
    out_b = lax.conv_general_dilated(
        x_dil, jnp.asarray(wf), window_strides=(1,), padding=[(0, 0)],
        dimension_numbers=("NWC", "WIO", "NWC"), precision=lax.Precision.HIGHEST,
    )

    a, b = np.asarray(out_a), np.asarray(out_b)
    # fp32 HIGHEST rel tolerance scaled to accumulation depth
    tol = 1e-3 * np.abs(ref).max()
    err_a, err_b = np.abs(a - ref).max(), np.abs(b - ref).max()
    ok = err_a < tol and err_b < tol
    print(f"t_in={t_in:5d} cin={cin:4d} cout={cout:4d}: "
          f"|lhs_dilation-ref|={err_a:.5f} |explicit_pad-ref|={err_b:.5f} "
          f"{'MATCH' if ok else 'MISMATCH'}")
    return ok


def main():
    # shapes from tiny probe up to the DAC decoder's stage-4 geometry (T ~ thousands,
    # C ~ tens) — the original failure was observed at real decode shapes
    ok = True
    for t_in, cin, cout in [(7, 2, 2), (250, 16, 8), (1000, 64, 32), (6000, 96, 48)]:
        ok &= check(t_in, cin, cout)
    if ok:
        print("ALL MATCH: lhs_dilation is correct on this runtime at the probed shapes")
        return 0
    print("MISMATCH: lhs_dilation path is miscompiled on this runtime (keep the workaround)")
    return 1


if __name__ == "__main__":
    sys.exit(main())
