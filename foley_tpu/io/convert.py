"""Checkpoint conversion: torch state-dicts (.pth / .safetensors) -> foley-tpu pytrees.

Capability parity with the reference's loaders (``nodes.py:57-151``, ``utils.py:49-87``,
``model_utils.py:17-257``): accepts nn.Module payloads / {"state_dict": ...} wrappers / flat
tensor dicts, detects fp8 flavor and dominant precision (``utils.py:492-515``), preserves fp8
bytes bit-exact, reports missing/unexpected keys.

Layout transforms performed here (so the hot path never permutes):
- torch Linear [out, in]            -> [in, out]
- torch Conv1d [out, in, K]         -> [K, in, out]
- torch ConvTranspose1d [in, out, K] -> [K, in, out]
- single-block fused qkv (H D K)-interleaved out-features (reference ``hifi_foley.py:362``)
  -> K-major (K H D) to match the triple blocks and our split
- DAC weight-norm (g, v) pairs folded into plain weights (old-style ``weight_g/weight_v``
  and new-style ``parametrizations.weight.original0/1`` both handled)
- per-block params stacked along a leading depth axis for ``lax.scan``.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from foley_tpu.configs import DACConfig, MMDiTConfig
from foley_tpu.core.params import stack_params
from foley_tpu.models.quantize import RVQConfig
from foley_tpu.ops.nn import fold_weight_norm
from foley_tpu.utils.logging import get_logger

logger = get_logger()

_TORCH_FP8_NAMES = ("float8_e4m3fn", "float8_e5m2")


# ---------------------------------------------------------------------------------
# Loading torch payloads without requiring a GPU torch build
# ---------------------------------------------------------------------------------

def _tensor_to_numpy(t) -> np.ndarray:
    """torch.Tensor -> numpy, routing fp8/bf16 through a byte view (numpy lacks the dtypes)."""
    import torch

    t = t.detach().cpu()
    if t.dtype == torch.bfloat16:
        import ml_dtypes

        return t.view(torch.uint16).numpy().view(ml_dtypes.bfloat16)
    if str(t.dtype).endswith("float8_e4m3fn"):
        import ml_dtypes

        return t.view(torch.uint8).numpy().view(ml_dtypes.float8_e4m3fn)
    if str(t.dtype).endswith("float8_e5m2"):
        import ml_dtypes

        return t.view(torch.uint8).numpy().view(ml_dtypes.float8_e5m2)
    return t.numpy()


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load .pth (torch.load) or .safetensors into {key: numpy array}.

    Accepts the same payload shapes as the reference's ``_extract_state`` (utils.py:49-59).
    A directory is treated as an HF checkpoint dir (model.safetensors / pytorch_model.bin /
    first *.safetensors|*.pth found), merging sharded safetensors if present.
    """
    import glob
    import os

    if os.path.isdir(path):
        for name in ("model.safetensors", "pytorch_model.bin"):
            p = os.path.join(path, name)
            if os.path.exists(p):
                return load_torch_state_dict(p)
        shards = sorted(glob.glob(os.path.join(path, "model-*-of-*.safetensors")))
        if shards:
            merged: Dict[str, np.ndarray] = {}
            for s in shards:
                merged.update(load_torch_state_dict(s))
            return merged
        candidates = sorted(glob.glob(os.path.join(path, "*.safetensors"))) or sorted(
            glob.glob(os.path.join(path, "*.pth"))
        )
        if not candidates:
            raise FileNotFoundError(f"No checkpoint file under directory {path}")
        return load_torch_state_dict(candidates[0])
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        try:
            return dict(load_file(path))
        except Exception:
            # bf16/fp8 tensors: fall back to torch-flavored safetensors loading
            from safetensors.torch import load_file as load_torch_file

            return {k: _tensor_to_numpy(v) for k, v in load_torch_file(path).items()}

    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, torch.nn.Module):
        sd = obj.state_dict()
    elif isinstance(obj, dict) and "state_dict" in obj and isinstance(obj["state_dict"], dict):
        sd = obj["state_dict"]
    elif isinstance(obj, dict):
        sd = {k: v for k, v in obj.items() if isinstance(v, torch.Tensor)}
    else:
        raise RuntimeError(f"Unsupported checkpoint payload: {type(obj)}")
    return {k: _tensor_to_numpy(v) for k, v in sd.items()}


# ---------------------------------------------------------------------------------
# Checkpoint dtype detection (reference utils.py:492-515)
# ---------------------------------------------------------------------------------

def detect_ckpt_fp8(sd: Dict[str, np.ndarray]) -> Optional[str]:
    """Return 'fp8_e4m3fn' / 'fp8_e5m2' if any tensor is stored in fp8, else None."""
    for v in sd.values():
        name = str(v.dtype)
        if "float8_e4m3" in name:
            return "fp8_e4m3fn"
        if "float8_e5m2" in name:
            return "fp8_e5m2"
    return None


def detect_ckpt_major_precision(sd: Dict[str, np.ndarray]) -> str:
    """Dominant precision by numel among {bf16, fp16, fp32}."""
    counts = {"bf16": 0, "fp16": 0, "fp32": 0}
    for v in sd.values():
        name = str(v.dtype)
        if "bfloat16" in name:
            counts["bf16"] += v.size
        elif name == "float16":
            counts["fp16"] += v.size
        elif name == "float32":
            counts["fp32"] += v.size
    return max(counts, key=counts.get)


# ---------------------------------------------------------------------------------
# Generic helpers
# ---------------------------------------------------------------------------------

class _KeyTracker:
    """Tracks consumption of a source state dict.

    ``take`` pops the source tensor after conversion so peak host memory stays ~1x the
    checkpoint size instead of ~2x (matters for the 10.3 GB XXL checkpoint)."""

    def __init__(self, sd: Dict[str, np.ndarray]):
        self.sd = sd
        self.all_keys = set(sd)
        self.used = set()
        self.missing: List[str] = []

    def take(self, key: str, transform=None) -> Optional[jnp.ndarray]:
        if key not in self.sd:
            self.missing.append(key)
            return None
        self.used.add(key)
        arr = self.sd.pop(key)
        if transform is not None:
            arr = transform(arr)
        return jnp.asarray(arr)

    def has(self, key: str) -> bool:
        return key in self.sd

    def unexpected(self) -> List[str]:
        return sorted(self.all_keys - self.used)


def _lin(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def _conv(w: np.ndarray) -> np.ndarray:
    # torch conv1d [out, in, K] -> [K, in, out]
    return np.ascontiguousarray(np.transpose(w, (2, 1, 0)))


def _convT(w: np.ndarray) -> np.ndarray:
    # torch conv_transpose1d [in, out, K] -> [K, in, out]
    return np.ascontiguousarray(np.transpose(w, (2, 0, 1)))


def _take_dense(t: _KeyTracker, prefix: str) -> Dict:
    p = {"w": t.take(prefix + ".weight", _lin)}
    if t.has(prefix + ".bias"):
        p["b"] = t.take(prefix + ".bias")
    return p


def _take_conv(t: _KeyTracker, prefix: str) -> Dict:
    p = {"w": t.take(prefix + ".weight", _conv)}
    if t.has(prefix + ".bias"):
        p["b"] = t.take(prefix + ".bias")
    return p


# ---------------------------------------------------------------------------------
# MMDiT conversion
# ---------------------------------------------------------------------------------

def _hdk_to_khd(w: np.ndarray, num_heads: int, head_dim: int, k: int = 3) -> np.ndarray:
    """Permute (H D K)-interleaved out-features to K-major (K H D). w: [..., H*D*K] out-axis
    last (after transposes) or 1-D bias."""
    lead = w.shape[:-1]
    x = w.reshape(*lead, num_heads, head_dim, k)
    x = np.moveaxis(x, -1, -3)  # [..., K, H, D]
    return np.ascontiguousarray(x.reshape(*lead, num_heads * head_dim * k))


def convert_mmdit_state_dict(
    sd: Dict[str, np.ndarray], cfg: MMDiTConfig, strict: bool = False,
    consume: bool = False,
) -> Dict:
    """Torch HunyuanVideoFoley state dict -> foley-tpu MMDiT param pytree.

    Key names mirror reference module attributes (``hifi_foley.py:392-527``).
    ``consume=True`` pops source tensors as they convert (peak host memory ~1x the 10.3 GB
    checkpoint instead of ~2x) — the caller's dict is emptied.
    """
    t = _KeyTracker(sd if consume else dict(sd))
    nh, hd = cfg.num_heads, cfg.head_dim

    params: Dict = {
        "audio_embedder": _take_conv(t, "audio_embedder.proj"),
        "visual_proj": {
            "w1": _take_dense(t, "visual_proj.w1"),
            "w2": _take_dense(t, "visual_proj.w2"),
            "w3": _take_dense(t, "visual_proj.w3"),
        },
        "cond_in": {
            "linear_1": _take_dense(t, "cond_in.linear_1"),
            "linear_2": _take_dense(t, "cond_in.linear_2"),
        },
        "time_in": {
            "mlp_0": _take_dense(t, "time_in.mlp.0"),
            "mlp_2": _take_dense(t, "time_in.mlp.2"),
        },
        "final_layer": {
            "linear": _take_dense(t, "final_layer.linear"),
            "adaLN": _take_dense(t, "final_layer.adaLN_modulation.1"),
        },
        "empty_clip_feat": t.take("empty_clip_feat"),
        "empty_sync_feat": t.take("empty_sync_feat"),
    }

    if cfg.sync_modulation or cfg.add_sync_feat_to_audio:
        params["sync_in"] = {
            "linear": _take_dense(t, "sync_in.0"),
            "conv_mlp": {
                "w1": _take_conv(t, "sync_in.2.w1"),
                "w2": _take_conv(t, "sync_in.2.w2"),
                "w3": _take_conv(t, "sync_in.2.w3"),
            },
        }
        params["sync_pos_emb"] = t.take("sync_pos_emb")

    def qknorm(prefix: str) -> Dict:
        return {"weight": t.take(prefix + ".weight")} if cfg.qk_norm else {}

    triple = []
    for i in range(cfg.depth_triple_blocks):
        p = f"triple_blocks.{i}"
        triple.append({
            "audio_mod": _take_dense(t, f"{p}.audio_mod.linear"),
            "v_cond_mod": _take_dense(t, f"{p}.v_cond_mod.linear"),
            "audio_self_attn_qkv": _take_dense(t, f"{p}.audio_self_attn_qkv"),
            "audio_self_q_norm": qknorm(f"{p}.audio_self_q_norm"),
            "audio_self_k_norm": qknorm(f"{p}.audio_self_k_norm"),
            "audio_self_proj": _take_dense(t, f"{p}.audio_self_proj"),
            "v_cond_attn_qkv": _take_dense(t, f"{p}.v_cond_attn_qkv"),
            "v_cond_attn_q_norm": qknorm(f"{p}.v_cond_attn_q_norm"),
            "v_cond_attn_k_norm": qknorm(f"{p}.v_cond_attn_k_norm"),
            "v_cond_self_proj": _take_dense(t, f"{p}.v_cond_self_proj"),
            "audio_cross_q": _take_dense(t, f"{p}.audio_cross_q"),
            "v_cond_cross_q": _take_dense(t, f"{p}.v_cond_cross_q"),
            "text_cross_kv": _take_dense(t, f"{p}.text_cross_kv"),
            "audio_cross_q_norm": qknorm(f"{p}.audio_cross_q_norm"),
            "v_cond_cross_q_norm": qknorm(f"{p}.v_cond_cross_q_norm"),
            "text_cross_k_norm": qknorm(f"{p}.text_cross_k_norm"),
            "audio_cross_proj": _take_dense(t, f"{p}.audio_cross_proj"),
            "v_cond_cross_proj": _take_dense(t, f"{p}.v_cond_cross_proj"),
            "audio_mlp": {
                "fc1": _take_dense(t, f"{p}.audio_mlp.fc1"),
                "fc2": _take_dense(t, f"{p}.audio_mlp.fc2"),
            },
            "v_cond_mlp": {
                "fc1": _take_dense(t, f"{p}.v_cond_mlp.fc1"),
                "fc2": _take_dense(t, f"{p}.v_cond_mlp.fc2"),
            },
        })

    def qkv_dense(prefix: str) -> Dict:
        # fused qkv with (H D K) out-feature interleaving -> K-major
        p = {"w": t.take(prefix + ".weight", lambda w: _hdk_to_khd(_lin(w), nh, hd))}
        if t.has(prefix + ".bias"):
            p["b"] = t.take(prefix + ".bias", lambda b: _hdk_to_khd(b, nh, hd))
        return p

    single = []
    for i in range(cfg.depth_single_blocks):
        p = f"single_blocks.{i}"
        single.append({
            "modulation": _take_dense(t, f"{p}.modulation.linear"),
            "linear_qkv": qkv_dense(f"{p}.linear_qkv"),
            "q_norm": {"weight": t.take(f"{p}.q_norm.weight")},
            "k_norm": {"weight": t.take(f"{p}.k_norm.weight")},
            "linear1": _take_conv(t, f"{p}.linear1"),
            "linear2": {
                "w1": _take_conv(t, f"{p}.linear2.w1"),
                "w2": _take_conv(t, f"{p}.linear2.w2"),
                "w3": _take_conv(t, f"{p}.linear2.w3"),
            },
        })

    _report(t, strict, "MMDiT")
    params["triple_blocks"] = stack_params(triple)
    params["single_blocks"] = stack_params(single)
    return params


# ---------------------------------------------------------------------------------
# DAC conversion (with weight-norm folding)
# ---------------------------------------------------------------------------------

def _conv2(w: np.ndarray) -> np.ndarray:
    # torch conv2d [out, in, Kh, Kw] -> [Kh, Kw, in, out]
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _take_wn_conv(t: _KeyTracker, prefix: str, transpose: bool = False, transform=None) -> Dict:
    """Take a weight-normed conv, folding g/v (old- or new-style keys) into a plain weight."""
    tr = transform if transform is not None else (_convT if transpose else _conv)
    if t.has(prefix + ".weight_g"):
        g = t.take(prefix + ".weight_g")
        v = t.take(prefix + ".weight_v")
    elif t.has(prefix + ".parametrizations.weight.original0"):
        g = t.take(prefix + ".parametrizations.weight.original0")
        v = t.take(prefix + ".parametrizations.weight.original1")
    else:
        # plain conv (already folded or never normed)
        p = {"w": t.take(prefix + ".weight", tr)}
        if t.has(prefix + ".bias"):
            p["b"] = t.take(prefix + ".bias")
        return p
    folded = fold_weight_norm(g, v, dim=0)  # torch layout, dim 0
    p = {"w": jnp.asarray(tr(np.asarray(folded)))}
    if t.has(prefix + ".bias"):
        p["b"] = t.take(prefix + ".bias")
    return p


def _take_snake(t: _KeyTracker, prefix: str) -> jnp.ndarray:
    # Snake1d alpha is stored [1, C, 1] (reference layers.py:29); we keep [C].
    return t.take(prefix + ".alpha", lambda a: a.reshape(-1))


def _take_residual_unit(t: _KeyTracker, prefix: str) -> Dict:
    return {
        "alpha1": _take_snake(t, f"{prefix}.block.0"),
        "conv1": _take_wn_conv(t, f"{prefix}.block.1"),
        "alpha2": _take_snake(t, f"{prefix}.block.2"),
        "conv2": _take_wn_conv(t, f"{prefix}.block.3"),
    }


def convert_dac_state_dict(
    sd: Dict[str, np.ndarray], cfg: DACConfig, strict: bool = False,
    consume: bool = False,
) -> Dict:
    """Torch DAC state dict -> foley-tpu pytree, weight norm folded.

    Sequential indices follow the reference structure (``dac.py:68-149``):
    decoder.model = [conv, block*len(rates), snake, conv, tanh];
    decoder block.block = [snake, convT, res, res, res];
    encoder.block = [conv, block*len(rates), snake, conv];
    encoder block.block = [res, res, res, snake, conv].
    ``consume=True`` pops source tensors as converted (caps peak host memory).
    """
    t = _KeyTracker(sd if consume else dict(sd))
    n_dec = len(cfg.decoder_rates)
    decoder: Dict = {
        "conv_in": _take_wn_conv(t, "decoder.model.0"),
        "blocks": [],
    }
    for i in range(n_dec):
        b = f"decoder.model.{i + 1}.block"
        decoder["blocks"].append({
            "alpha": _take_snake(t, f"{b}.0"),
            "conv_t": _take_wn_conv(t, f"{b}.1", transpose=True),
            "res": [_take_residual_unit(t, f"{b}.{j}") for j in (2, 3, 4)],
        })
    decoder["alpha_out"] = _take_snake(t, f"decoder.model.{n_dec + 1}")
    decoder["conv_out"] = _take_wn_conv(t, f"decoder.model.{n_dec + 2}")

    n_enc = len(cfg.encoder_rates)
    encoder: Dict = {"conv_in": _take_wn_conv(t, "encoder.block.0"), "blocks": []}
    for i in range(n_enc):
        b = f"encoder.block.{i + 1}.block"
        encoder["blocks"].append({
            "res": [_take_residual_unit(t, f"{b}.{j}") for j in (0, 1, 2)],
            "alpha": _take_snake(t, f"{b}.3"),
            "conv_d": _take_wn_conv(t, f"{b}.4"),
        })
    encoder["alpha_out"] = _take_snake(t, f"encoder.block.{n_enc + 1}")
    encoder["conv_out"] = _take_wn_conv(t, f"encoder.block.{n_enc + 2}")

    params = {
        "encoder": encoder,
        "decoder": decoder,
        "quant_conv": _take_conv(t, "quant_conv"),
        "post_quant_conv": _take_conv(t, "post_quant_conv"),
    }
    _report(t, strict, "DAC")
    return params


def convert_rvq_state_dict(sd: Dict[str, np.ndarray], cfg: RVQConfig, strict: bool = False) -> Dict:
    """Torch ``ResidualVectorQuantize`` state dict -> ``models.quantize`` params.

    Reference structure (``dac_vae/nn/quantize.py:96-141``): ``quantizers.{i}.{in_proj,
    out_proj}`` are weight-normed 1x1 convs (folded here to dense [in, out]) and
    ``quantizers.{i}.codebook`` is an nn.Embedding [codebook_size, codebook_dim]."""
    t = _KeyTracker(dict(sd))

    def dense_1x1(prefix: str) -> Dict:
        p = _take_wn_conv(t, prefix)  # w: [K=1, in, out]
        return {"w": p["w"][0], "b": p.get("b")}

    quantizers = []
    for i in range(cfg.n_codebooks):
        q = f"quantizers.{i}"
        quantizers.append({
            "in_proj": dense_1x1(f"{q}.in_proj"),
            "out_proj": dense_1x1(f"{q}.out_proj"),
            "codebook": t.take(f"{q}.codebook.weight"),
        })
    _report(t, strict, "RVQ")
    return {"quantizers": quantizers}


def convert_discriminator_state_dict(
    sd: Dict[str, np.ndarray], cfg, strict: bool = False, consume: bool = False,
) -> Dict:
    """Torch GAN ``Discriminator`` state dict -> ``models.dac_discriminator`` params.

    Reference structure (``dac_vae/model/discriminator.py:175-216``):
    ``discriminators`` is MPDs (one per period), then MSDs (per rate), then MRDs (per fft
    size). Every conv is weight-normed; act=True convs sit at Sequential index 0
    (``WNConv{1,2}d``), the ``conv_post`` layers are bare. ``cfg`` is a
    ``dac_discriminator.DiscriminatorConfig`` supplying the period/rate/fft counts
    (MRD band count is the reference's fixed 5)."""
    t = _KeyTracker(sd if consume else dict(sd))
    idx = 0

    def wn2d(prefix: str, seq: bool) -> Dict:
        return _take_wn_conv(t, prefix + (".0" if seq else ""), transform=_conv2)

    def wn1d(prefix: str, seq: bool) -> Dict:
        return _take_wn_conv(t, prefix + (".0" if seq else ""), transform=_conv)

    mpd = []
    for _ in cfg.periods:
        p = f"discriminators.{idx}"
        mpd.append({
            "convs": [wn2d(f"{p}.convs.{j}", seq=True) for j in range(5)],
            "post": wn2d(f"{p}.conv_post", seq=False),
        })
        idx += 1
    msd = []
    for _ in cfg.rates:
        p = f"discriminators.{idx}"
        msd.append({
            "convs": [wn1d(f"{p}.convs.{j}", seq=True) for j in range(6)],
            "post": wn1d(f"{p}.conv_post", seq=False),
        })
        idx += 1
    mrd = []
    for _ in cfg.fft_sizes:
        p = f"discriminators.{idx}"
        mrd.append({
            "band_convs": [
                [wn2d(f"{p}.band_convs.{b}.{j}", seq=True) for j in range(5)]
                for b in range(5)
            ],
            "post": wn2d(f"{p}.conv_post", seq=False),
        })
        idx += 1
    _report(t, strict, "Discriminator")
    return {"mpd": mpd, "msd": msd, "mrd": mrd}


def _report(t: _KeyTracker, strict: bool, name: str) -> None:
    missing = [k for k in t.missing]
    unexpected = t.unexpected()
    if missing:
        msg = f"{name}: {len(missing)} missing keys (e.g. {missing[:5]})"
        if strict:
            raise KeyError(msg)
        logger.warning(msg)
    if unexpected:
        logger.info(f"{name}: {len(unexpected)} unexpected ckpt keys ignored (e.g. {unexpected[:5]})")


# ---------------------------------------------------------------------------------
# Converter CLI: torch checkpoint -> orbax pytree
# ---------------------------------------------------------------------------------

def _main(argv=None):
    """``python -m foley_tpu.io.convert <model|dac> <in.(pth|safetensors)> <out_dir>``
    — convert once (weight-norm folding, layout permutes, fp8 passthrough) and save the
    orbax artifact for fast subsequent loads."""
    import argparse

    from foley_tpu.configs import DACConfig, get_config
    from foley_tpu.io.orbax_io import save_params

    p = argparse.ArgumentParser("foley-tpu-convert", description=_main.__doc__)
    p.add_argument("kind", choices=["model", "dac"])
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--config", default="xxl")
    args = p.parse_args(argv)

    sd = load_torch_state_dict(args.src)
    logger.info(f"loaded {len(sd)} tensors; fp8={detect_ckpt_fp8(sd)}, "
                f"major={detect_ckpt_major_precision(sd)}")
    if args.kind == "model":
        params = convert_mmdit_state_dict(sd, get_config(args.config).model, consume=True)
    else:
        params = convert_dac_state_dict(sd, DACConfig(), consume=True)
    save_params(args.dst, params)


if __name__ == "__main__":
    _main()
