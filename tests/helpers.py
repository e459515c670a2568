"""Shared builders for synthetic reference-format checkpoints (tiny configs).

Used by test_io (converter goldens) and test_node_graph (full Loader->DepsLoader->Sampler
graph driven from on-disk checkpoint files, mirroring the reference's file-based loading).
"""

import json
import math
import os

import numpy as np
import torch


def wn_conv_sd(prefix, conv, sd):
    """Old-style weight-norm keys from a plain torch conv; returns the effective weight."""
    import torch.nn.utils.parametrizations as P

    wn = P.weight_norm(conv)
    sd[f"{prefix}.weight_g"] = wn.parametrizations.weight.original0.detach().numpy()
    sd[f"{prefix}.weight_v"] = wn.parametrizations.weight.original1.detach().numpy()
    if conv.bias is not None:
        sd[f"{prefix}.bias"] = conv.bias.detach().numpy()
    return wn.weight.detach().numpy()


def make_dac_state_dict(cfg, seed: int = 0):
    """Reference-format DAC-VAE state dict at the given config; returns (sd, conv_in_eff)."""
    torch.manual_seed(seed)
    sd = {}
    d = cfg.decoder_dim
    eff = wn_conv_sd("decoder.model.0", torch.nn.Conv1d(cfg.latent_dim, d, 7, padding=3), sd)
    out_dim = d
    for i, s in enumerate(cfg.decoder_rates):
        in_dim, out_dim = d // 2 ** i, d // 2 ** (i + 1)
        b = f"decoder.model.{i+1}.block"
        sd[f"{b}.0.alpha"] = np.ones((1, in_dim, 1), np.float32)
        wn_conv_sd(f"{b}.1", torch.nn.ConvTranspose1d(in_dim, out_dim, 2 * s, stride=s), sd)
        for j, dil in zip((2, 3, 4), (1, 3, 9)):
            sd[f"{b}.{j}.block.0.alpha"] = np.ones((1, out_dim, 1), np.float32)
            wn_conv_sd(f"{b}.{j}.block.1",
                       torch.nn.Conv1d(out_dim, out_dim, 7, dilation=dil, padding=3 * dil), sd)
            sd[f"{b}.{j}.block.2.alpha"] = np.ones((1, out_dim, 1), np.float32)
            wn_conv_sd(f"{b}.{j}.block.3", torch.nn.Conv1d(out_dim, out_dim, 1), sd)
    n = len(cfg.decoder_rates)
    sd[f"decoder.model.{n+1}.alpha"] = np.ones((1, out_dim, 1), np.float32)
    wn_conv_sd(f"decoder.model.{n+2}", torch.nn.Conv1d(out_dim, 1, 7, padding=3), sd)
    e = cfg.encoder_dim
    wn_conv_sd("encoder.block.0", torch.nn.Conv1d(1, e, 7, padding=3), sd)
    dim = e
    for i, s in enumerate(cfg.encoder_rates):
        dim *= 2
        b = f"encoder.block.{i+1}.block"
        for j, dil in zip((0, 1, 2), (1, 3, 9)):
            sd[f"{b}.{j}.block.0.alpha"] = np.ones((1, dim // 2, 1), np.float32)
            wn_conv_sd(f"{b}.{j}.block.1",
                       torch.nn.Conv1d(dim // 2, dim // 2, 7, dilation=dil, padding=3 * dil), sd)
            sd[f"{b}.{j}.block.2.alpha"] = np.ones((1, dim // 2, 1), np.float32)
            wn_conv_sd(f"{b}.{j}.block.3", torch.nn.Conv1d(dim // 2, dim // 2, 1), sd)
        sd[f"{b}.3.alpha"] = np.ones((1, dim // 2, 1), np.float32)
        wn_conv_sd(f"{b}.4", torch.nn.Conv1d(dim // 2, dim, 2 * s, stride=s,
                                             padding=math.ceil(s / 2)), sd)
    n = len(cfg.encoder_rates)
    sd[f"encoder.block.{n+1}.alpha"] = np.ones((1, dim, 1), np.float32)
    wn_conv_sd(f"encoder.block.{n+2}", torch.nn.Conv1d(dim, cfg.latent_dim, 3, padding=1), sd)
    qc = torch.nn.Conv1d(cfg.latent_dim, 2 * cfg.latent_dim, 1)
    sd["quant_conv.weight"] = qc.weight.detach().numpy()
    sd["quant_conv.bias"] = qc.bias.detach().numpy()
    pc = torch.nn.Conv1d(cfg.latent_dim, cfg.latent_dim, 1)
    sd["post_quant_conv.weight"] = pc.weight.detach().numpy()
    sd["post_quant_conv.bias"] = pc.bias.detach().numpy()
    return sd, eff


def save_dac_checkpoint(path: str, cfg, seed: int = 0) -> str:
    """Write a reference-format DAC .safetensors file; returns the path."""
    from safetensors.numpy import save_file

    sd, _ = make_dac_state_dict(cfg, seed)
    save_file(sd, path)
    return path


def save_word_tokenizer(dirpath: str) -> str:
    """Build a minimal offline whitespace WordLevel tokenizer AutoTokenizer can load."""
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    words = ("glass shattering footsteps on ice rain thunder noisy harsh a the clink "
             "crunchy metal water wind").split()
    vocab = {"<pad>": 0, "<unk>": 1}
    for w in words:
        vocab.setdefault(w, len(vocab))
    tok = Tokenizer(models.WordLevel(vocab=vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    fast = PreTrainedTokenizerFast(tokenizer_object=tok, pad_token="<pad>", unk_token="<unk>")
    os.makedirs(dirpath, exist_ok=True)
    fast.save_pretrained(dirpath)
    return dirpath


def save_tiny_clap_checkpoint(dirpath: str, hidden: int, heads: int = 2, layers: int = 1,
                              vocab_size: int = 64, seed: int = 0) -> str:
    """HF-layout CLAP text-tower checkpoint dir (model.safetensors + config.json + tokenizer).

    pad_token_id=0 to match the WordLevel tokenizer's <pad> id.
    """
    from transformers import ClapTextConfig as HFCfg, ClapTextModel

    torch.manual_seed(seed)
    hf_cfg = HFCfg(
        vocab_size=vocab_size, hidden_size=hidden, num_hidden_layers=layers,
        num_attention_heads=heads, intermediate_size=2 * hidden,
        max_position_embeddings=32, type_vocab_size=1, pad_token_id=0, hidden_act="gelu",
    )
    model = ClapTextModel(hf_cfg).eval()
    os.makedirs(dirpath, exist_ok=True)
    from safetensors.torch import save_file

    save_file({k: v.contiguous() for k, v in model.state_dict().items()},
              os.path.join(dirpath, "model.safetensors"))
    json.dump(
        {"num_attention_heads": heads, "pad_token_id": 0, "layer_norm_eps": 1e-12},
        open(os.path.join(dirpath, "config.json"), "w"),
    )
    save_word_tokenizer(dirpath)
    return dirpath


def save_tiny_siglip2_checkpoint(dirpath: str, hidden: int, heads: int = 2, layers: int = 1,
                                 image_size: int = 32, patch_size: int = 8,
                                 seed: int = 0) -> str:
    """HF-layout SiglipVisionModel checkpoint dir (model.safetensors + config.json)."""
    from transformers import SiglipVisionConfig as HFC, SiglipVisionModel

    torch.manual_seed(seed)
    hf = SiglipVisionModel(HFC(
        hidden_size=hidden, intermediate_size=2 * hidden, num_hidden_layers=layers,
        num_attention_heads=heads, image_size=image_size, patch_size=patch_size,
    )).eval()
    os.makedirs(dirpath, exist_ok=True)
    from safetensors.torch import save_file

    save_file({k: v.contiguous() for k, v in hf.state_dict().items()},
              os.path.join(dirpath, "model.safetensors"))
    json.dump({"num_attention_heads": heads, "layer_norm_eps": 1e-6},
              open(os.path.join(dirpath, "config.json"), "w"))
    return dirpath
