"""CLAP text encoder (laion/larger_clap_general) — JAX port of the text tower.

The reference loads HF ``ClapTextModelWithProjection`` and uses the **last_hidden_state**
(not the projection) as the 768-d token-sequence condition (``feature_utils.py:134-138``,
``nodes.py:200-201``). The text tower is a RoBERTa-style post-LN encoder; this module
implements it functionally in JAX with a converter from the HF state dict, so text encoding
runs on-TPU instead of through torch.

Tokenization stays host-side via ``transformers.AutoTokenizer`` (the survey's dependency
policy: tokenizers + ffmpeg are the only host-side utilities).

RoBERTa specifics preserved: position ids = cumsum(mask)*mask + pad_token_id (positions start
at pad_token_id+1), additive -inf padding mask, exact-gelu MLPs, LayerNorm eps from config.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from foley_tpu.ops.nn import apply_dense, init_dense
from foley_tpu.ops.norms import layer_norm


@dataclasses.dataclass(frozen=True)
class ClapTextConfig:
    vocab_size: int = 50265
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 514
    type_vocab_size: int = 1
    pad_token_id: int = 1
    layer_norm_eps: float = 1e-12

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def tiny(cls) -> "ClapTextConfig":
        return cls(vocab_size=100, hidden_size=32, num_hidden_layers=2,
                   num_attention_heads=2, intermediate_size=64, max_position_embeddings=20)


# ---------------------------------------------------------------------------------
# Init / convert
# ---------------------------------------------------------------------------------

def _init_ln(dim, dtype):
    return {"weight": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def init(key, cfg: ClapTextConfig, dtype=jnp.float32) -> Dict:
    keys = iter(jax.random.split(key, 8 + 8 * cfg.num_hidden_layers))
    h, i_sz = cfg.hidden_size, cfg.intermediate_size
    params = {
        "embeddings": {
            "word": 0.02 * jax.random.normal(next(keys), (cfg.vocab_size, h), dtype),
            "position": 0.02 * jax.random.normal(next(keys), (cfg.max_position_embeddings, h), dtype),
            "token_type": 0.02 * jax.random.normal(next(keys), (cfg.type_vocab_size, h), dtype),
            "ln": _init_ln(h, dtype),
        },
        "layers": [],
    }
    for _ in range(cfg.num_hidden_layers):
        params["layers"].append({
            "q": init_dense(next(keys), h, h, dtype=dtype),
            "k": init_dense(next(keys), h, h, dtype=dtype),
            "v": init_dense(next(keys), h, h, dtype=dtype),
            "attn_out": init_dense(next(keys), h, h, dtype=dtype),
            "attn_ln": _init_ln(h, dtype),
            "inter": init_dense(next(keys), h, i_sz, dtype=dtype),
            "out": init_dense(next(keys), i_sz, h, dtype=dtype),
            "out_ln": _init_ln(h, dtype),
        })
    return params


def convert_hf_state_dict(sd: Dict[str, np.ndarray], cfg: ClapTextConfig,
                          prefix: str = "") -> Dict:
    """HF ClapTextModel (or text_model.*-prefixed) state dict -> pytree."""
    def lin(name):
        p = {"w": jnp.asarray(np.ascontiguousarray(sd[prefix + name + ".weight"].T))}
        if prefix + name + ".bias" in sd:
            p["b"] = jnp.asarray(sd[prefix + name + ".bias"])
        return p

    def ln(name):
        return {"weight": jnp.asarray(sd[prefix + name + ".weight"]),
                "bias": jnp.asarray(sd[prefix + name + ".bias"])}

    params = {
        "embeddings": {
            "word": jnp.asarray(sd[prefix + "embeddings.word_embeddings.weight"]),
            "position": jnp.asarray(sd[prefix + "embeddings.position_embeddings.weight"]),
            "token_type": jnp.asarray(sd[prefix + "embeddings.token_type_embeddings.weight"]),
            "ln": ln("embeddings.LayerNorm"),
        },
        "layers": [],
    }
    for i in range(cfg.num_hidden_layers):
        b = f"encoder.layer.{i}."
        params["layers"].append({
            "q": lin(b + "attention.self.query"),
            "k": lin(b + "attention.self.key"),
            "v": lin(b + "attention.self.value"),
            "attn_out": lin(b + "attention.output.dense"),
            "attn_ln": ln(b + "attention.output.LayerNorm"),
            "inter": lin(b + "intermediate.dense"),
            "out": lin(b + "output.dense"),
            "out_ln": ln(b + "output.LayerNorm"),
        })
    return params


# ---------------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------------

def _ln(p, x, eps):
    return layer_norm(x, p["weight"], p["bias"], eps=eps)


def apply(
    params: Dict,
    input_ids: jnp.ndarray,        # [B, L] int32
    attention_mask: jnp.ndarray,   # [B, L] {0, 1}
    cfg: ClapTextConfig,
) -> jnp.ndarray:
    """-> last_hidden_state [B, L, hidden]."""
    mask = attention_mask.astype(jnp.int32)
    # RoBERTa position ids: pad positions keep pad_token_id; others count from pad+1
    position_ids = jnp.cumsum(mask, axis=1) * mask + cfg.pad_token_id

    emb = params["embeddings"]
    x = emb["word"][input_ids] + emb["position"][position_ids] + emb["token_type"][0]
    x = _ln(emb["ln"], x, cfg.layer_norm_eps)

    # additive padding bias [B, 1, 1, L]
    bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, jnp.finfo(jnp.float32).min)
    nh, hd = cfg.num_attention_heads, cfg.head_dim
    b, l, h = x.shape

    for layer in params["layers"]:
        q = apply_dense(layer["q"], x).reshape(b, l, nh, hd)
        k = apply_dense(layer["k"], x).reshape(b, l, nh, hd)
        v = apply_dense(layer["v"], x).reshape(b, l, nh, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None)
        logits = logits / (hd ** 0.5) + bias
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, l, h)
        x = _ln(layer["attn_ln"], x + apply_dense(layer["attn_out"], ctx), cfg.layer_norm_eps)
        inter = jax.nn.gelu(apply_dense(layer["inter"], x), approximate=False)
        x = _ln(layer["out_ln"], x + apply_dense(layer["out"], inter), cfg.layer_norm_eps)
    return x


# ---------------------------------------------------------------------------------
# High-level encode (tokenizer is host-side)
# ---------------------------------------------------------------------------------

class ClapTextEncoder:
    """Bundled tokenizer + params, mirroring ``encode_text_feat`` (feature_utils.py:134-138)."""

    def __init__(self, params: Dict, cfg: ClapTextConfig, tokenizer):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self._apply = jax.jit(apply, static_argnames=("cfg",))

    def encode(self, prompts: List[str], max_length: Optional[int] = None) -> jnp.ndarray:
        tok = self.tokenizer(
            prompts, padding=True, truncation=True,
            max_length=max_length or self.cfg.max_position_embeddings - 2,
            return_tensors="np",
        )
        return self._apply(
            self.params,
            jnp.asarray(tok["input_ids"], jnp.int32),
            jnp.asarray(tok["attention_mask"], jnp.int32),
            self.cfg,
        )


def encode_text(encoder: ClapTextEncoder, prompts: List[str]) -> jnp.ndarray:
    """[neg, pos, ...] prompts -> [N, L, hidden] (CFG row ordering preserved by caller)."""
    return encoder.encode(prompts)


def _infer_config(sd: Dict, prefix: str, model_path: str) -> ClapTextConfig:
    """Derive the text-tower config from checkpoint shapes (+ colocated HF config.json).

    Shape-derivable fields come from the state dict so any checkpoint size loads; head count,
    pad id and LN eps are not in the shapes — they come from config.json when present, else
    the larger_clap_general defaults (head_dim 64).
    """
    import json
    import os

    vocab_size, hidden = sd[prefix + "embeddings.word_embeddings.weight"].shape
    max_pos = sd[prefix + "embeddings.position_embeddings.weight"].shape[0]
    type_vocab = sd[prefix + "embeddings.token_type_embeddings.weight"].shape[0]
    inter = sd[prefix + "encoder.layer.0.intermediate.dense.weight"].shape[0]
    n_layers = 1 + max(
        int(k.split(".")[len(prefix.split(".")) + 1])
        for k in sd
        if k.startswith(prefix + "encoder.layer.")
    )
    heads = max(1, hidden // 64)
    pad_token_id, eps = 1, 1e-12
    cfg_json = os.path.join(model_path, "config.json") if os.path.isdir(model_path) else None
    if cfg_json and os.path.exists(cfg_json):
        raw = json.load(open(cfg_json))
        raw = raw.get("text_config", raw)
        heads = int(raw.get("num_attention_heads", heads))
        pad_token_id = int(raw.get("pad_token_id") or pad_token_id)
        eps = float(raw.get("layer_norm_eps", eps))
    return ClapTextConfig(
        vocab_size=int(vocab_size), hidden_size=int(hidden), num_hidden_layers=int(n_layers),
        num_attention_heads=heads, intermediate_size=int(inter),
        max_position_embeddings=int(max_pos), type_vocab_size=int(type_vocab),
        pad_token_id=pad_token_id, layer_norm_eps=eps,
    )


def load(model_path: str, tokenizer_path: Optional[str] = None) -> ClapTextEncoder:
    """Load from a local HF checkpoint directory or state-dict file.

    Tokenizer resolution (zero-egress friendly): an explicit ``tokenizer_path`` wins; else a
    tokenizer colocated with a directory checkpoint is used; else fall back to the hub id
    ``roberta-base`` (the reference's CLAP tokenizer family, ``nodes.py:200``) — which needs
    network/HF-cache access, so failures get a clear local-path hint.
    """
    import os

    from foley_tpu.io.convert import load_torch_state_dict

    sd = load_torch_state_dict(model_path)
    # Strip HF wrapper prefixes ('text_model.' for ClapTextModelWithProjection exports).
    prefix = ""
    if any(k.startswith("text_model.") for k in sd):
        prefix = "text_model."
    cfg = _infer_config(sd, prefix, model_path)
    params = convert_hf_state_dict(sd, cfg, prefix=prefix)
    from transformers import AutoTokenizer

    if not tokenizer_path and os.path.isdir(model_path) and any(
        os.path.exists(os.path.join(model_path, f))
        for f in ("tokenizer.json", "tokenizer_config.json", "vocab.json")
    ):
        tokenizer_path = model_path
    try:
        tokenizer = AutoTokenizer.from_pretrained(tokenizer_path or "roberta-base")
    except Exception as e:
        raise RuntimeError(
            f"CLAP tokenizer load failed ({e}); in an offline environment pass a local "
            "tokenizer directory via tokenizer_path (or colocate tokenizer.json with a "
            "directory checkpoint)."
        ) from e
    return ClapTextEncoder(params, cfg, tokenizer)
