#!/usr/bin/env python
"""Minimal client for the foley-tpu HTTP service (serving/server.py) — stdlib only.

Start a server first, e.g.:
    python -m foley_tpu.serving.server --model_path ckpts/ --durations 5 --enable_v2a
    # or checkpoint-free: ... --random_init tiny --durations 1 --warmup_steps 4

Text-to-audio:
    python examples/serve_client.py --prompt "rain on a tin roof" --duration 5 -o rain.wav

Video-to-audio (a directory of image frames; encoded client-side as the frames_b64
.npz payload the server accepts — works against a remote server, unlike frames_path):
    python examples/serve_client.py --prompt "footsteps" --frames_dir clip_frames/ \
        --frames_fps 24 --duration 5 -o steps.wav
"""

import argparse
import base64
import io
import json
import sys
import urllib.request


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--server", default="http://127.0.0.1:8321")
    ap.add_argument("--prompt", default="")
    ap.add_argument("--negative_prompt", default="noisy, harsh")
    ap.add_argument("--duration", type=float, default=5.0)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--cfg_scale", type=float, default=4.5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--frames_dir", default="", help="image-frame directory for V2A")
    ap.add_argument("--frames_fps", type=float, default=16.0)
    ap.add_argument("-o", "--output", default="out.wav")
    args = ap.parse_args()

    body = {
        "prompt": args.prompt, "negative_prompt": args.negative_prompt,
        "duration": args.duration, "steps": args.steps, "cfg_scale": args.cfg_scale,
        "seed": args.seed,
    }
    if args.frames_dir:
        import numpy as np

        sys.path.insert(0, __file__.rsplit("/", 2)[0])
        from foley_tpu.io.images import frames_to_u8
        from foley_tpu.pipeline.video import read_frames_dir

        frames, fps = read_frames_dir(args.frames_dir, fps=args.frames_fps)
        buf = io.BytesIO()
        np.savez(buf, frames=frames_to_u8(frames))
        body["frames_b64"] = base64.b64encode(buf.getvalue()).decode()
        body["frames_fps"] = fps

    req = urllib.request.Request(
        args.server + "/generate", data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=600) as r:
            wav = r.read()
    except urllib.error.HTTPError as e:
        print(f"server error {e.code}: {e.read().decode()[:300]}", file=sys.stderr)
        return 1
    with open(args.output, "wb") as f:
        f.write(wav)
    print(f"wrote {args.output} ({len(wav)} bytes)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
