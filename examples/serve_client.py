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

Streaming (long-form: audio chunks arrive as each 30 s window finalizes — the script
reports time-to-first-audio and writes the WAV when the stream ends):
    python examples/serve_client.py --prompt "rain" --duration 90 --stream -o rain.wav

Continue an existing 48 kHz WAV by --duration seconds (composable with --stream):
    python examples/serve_client.py --prompt "rain fading out" --continue_wav rain.wav \
        --duration 10 -o more.wav
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
    ap.add_argument("--stream", action="store_true",
                    help="response=pcm16_stream: read audio progressively as long-form "
                         "windows finalize; prints time-to-first-audio")
    ap.add_argument("--first_window", type=float, default=None,
                    help="streaming latency ramp: denoise/emit this many seconds first "
                         "(TTFA ~ first_window/window of a full window's cost)")
    ap.add_argument("--continue_wav", default="",
                    help="continue this 48 kHz WAV by --duration seconds (the server "
                         "conditions on its tail)")
    ap.add_argument("--context_s", type=float, default=4.0,
                    help="--continue_wav: seconds of tail context")
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

    if args.continue_wav:
        with open(args.continue_wav, "rb") as f:
            body["continue_b64"] = base64.b64encode(f.read()).decode()
        body["context_s"] = args.context_s
    if args.stream:
        body["response"] = "pcm16_stream"
        if args.first_window is not None:
            body["first_window_s"] = args.first_window

    req = urllib.request.Request(
        args.server + "/generate", data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=600) as r:
            if args.stream:
                import time
                import wave

                sr = int(r.headers["X-Sample-Rate"])
                total = int(r.headers["X-Total-Samples"])
                t0 = time.perf_counter()
                got, parts, first = 0, [], None
                while True:
                    chunk = r.read(65536)  # arrives as windows finalize server-side
                    if not chunk:
                        break
                    if first is None:
                        first = time.perf_counter() - t0
                        print(f"first audio after {first:.2f}s")
                    parts.append(chunk)
                    got += len(chunk) // 2
                    print(f"\r{got}/{total} samples ({got / sr:.1f}s)", end="", flush=True)
                print(f"\ntotal wall {time.perf_counter() - t0:.2f}s")
                with wave.open(args.output, "wb") as f:
                    f.setnchannels(1)
                    f.setsampwidth(2)
                    f.setframerate(sr)
                    f.writeframes(b"".join(parts))
                print(f"wrote {args.output} ({got} samples)")
                return 0 if got == total else 1
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
