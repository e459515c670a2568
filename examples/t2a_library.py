"""Runnable no-checkpoint text-to-audio example through the library API (tiny random model).

    python examples/t2a_library.py /tmp/demo.wav
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from foley_tpu.api.nodes import HunyuanModelLoader
from foley_tpu.configs import get_config
from foley_tpu.io.audio import write_wav
from foley_tpu.models import dac_vae
from foley_tpu.pipeline.generate import ModelBundle, generate_audio


def main(out_path: str = "/tmp/demo.wav") -> None:
    cfg = get_config("tiny")
    foley = HunyuanModelLoader.init_random("tiny", "fp32", seed=0)
    bundle = ModelBundle(
        mmdit_params=foley["params"],
        dac_params=dac_vae.init(jax.random.PRNGKey(1), cfg.dac),
        pipeline_cfg=cfg,
        compute_dtype=jnp.float32,
    )
    # with real checkpoints, text features come from foley_tpu.models.clap
    text = jnp.zeros((1, cfg.model.text_length, cfg.model.condition_dim), jnp.float32)
    result = generate_audio(
        bundle, text, text, duration_s=1.0,
        guidance_scale=4.5, num_inference_steps=10, sampler="euler", seed=7,
    )
    write_wav(out_path, np.asarray(result.audio_first)[0], result.sample_rate)
    print(f"wrote {out_path} ({result.sample_rate} Hz), timings: {result.timings}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/demo.wav")
