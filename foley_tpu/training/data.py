"""Training data pipeline: datasets, feature packing, and a device-prefetching loader.

The reference ships *dormant* training machinery with no data pipeline at all — its only
data-side artifact is the Synchformer transforms suite (``data_transforms.py``; ported in
``pipeline/transforms.py``). This module completes the training capability TPU-first:

- ``AudioFolderDataset``: walks a directory of WAV clips (stdlib/native decode via
  ``io/audio.py::read_wav``), draws fixed-length random crops, and applies the transforms
  suite. Fixed shapes => one compiled train step, no recompiles.
- ``encode_corpus`` / ``NpzShardDataset``: offline DAC encoding of a corpus into .npz latent
  shards (the standard TPU recipe: precompute encoder features once, stream small latents at
  train time instead of re-running frozen encoders every step).
- ``flow_match_batches``: assembles the ``{latents, cond, clip_feat, sync_feat}`` batches
  ``training/train.py::flow_match_loss`` consumes, using the model's learned empty
  clip/sync sequences for audio-only (T2A-style) training.
- ``PrefetchLoader``: a background thread stages the next batches on device
  (``jax.device_put``, optionally with a ``NamedSharding`` over the mesh's 'data' axis) while
  the current step runs — host IO and H2D copies overlap TPU compute, so the input pipeline
  never serializes with the train step.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Callable, Dict, Iterator, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from foley_tpu.utils.logging import get_logger

logger = get_logger()

_WAV_EXTS = (".wav", ".wave")


def list_audio_files(root: str) -> List[str]:
    """All WAV files under ``root``, sorted for a deterministic epoch order."""
    out: List[str] = []
    for dirpath, _, names in os.walk(root):
        out.extend(
            os.path.join(dirpath, n) for n in names if n.lower().endswith(_WAV_EXTS)
        )
    return sorted(out)


class AudioFolderDataset:
    """Infinite sampler of fixed-length mono crops from a folder of WAV files.

    Yields items ``{"audio": [T] fp32, "path": str}`` (plus whatever the transforms add).
    Short files are looped to ``clip_seconds``; rates are converted to ``sample_rate``.
    ``transforms`` is a callable (e.g. ``pipeline.transforms.Compose``) applied per item.
    """

    def __init__(
        self,
        root: str,
        clip_seconds: float,
        sample_rate: int = 48000,
        transforms: Optional[Callable[[dict], dict]] = None,
        seed: int = 0,
    ):
        self.files = list_audio_files(root)
        if not self.files:
            raise FileNotFoundError(f"no WAV files under {root}")
        self.clip_len = int(round(clip_seconds * sample_rate))
        self.sample_rate = sample_rate
        self.transforms = transforms
        self._rng = np.random.default_rng(seed)
        logger.info(f"AudioFolderDataset: {len(self.files)} files under {root}")

    def _crop(self, x: np.ndarray) -> np.ndarray:
        if len(x) < self.clip_len:
            x = np.tile(x, int(np.ceil(self.clip_len / max(len(x), 1))))
        start = int(self._rng.integers(0, len(x) - self.clip_len + 1))
        return x[start : start + self.clip_len]

    def __iter__(self) -> Iterator[dict]:
        from foley_tpu.io.audio import read_wav

        while True:
            order = self._rng.permutation(len(self.files))
            for i in order:
                path = self.files[int(i)]
                try:
                    x, _ = read_wav(path, target_sr=self.sample_rate)
                except Exception as e:  # corrupt file: skip, don't kill the epoch
                    logger.warning(f"skipping unreadable {path}: {e}")
                    continue
                item = {"audio": self._crop(x), "path": path}
                if self.transforms is not None:
                    item = self.transforms(item)
                yield item


def batch_items(items: Iterator[dict], batch_size: int, keys: Sequence[str]) -> Iterator[Dict]:
    """Stack ``batch_size`` consecutive items' ``keys`` into numpy batches."""
    buf: List[dict] = []
    for item in items:
        buf.append(item)
        if len(buf) == batch_size:
            yield {k: np.stack([b[k] for b in buf]) for k in keys}
            buf = []


# ---------------------------------------------------------------------------------
# Offline corpus encoding -> npz latent shards
# ---------------------------------------------------------------------------------

def encode_corpus(
    dac_params: Dict,
    dac_cfg,
    dataset: Iterator[dict],
    out_dir: str,
    num_clips: int,
    batch_size: int = 8,
    shard_size: int = 256,
    seed: int = 0,
) -> List[str]:
    """DAC-encode ``num_clips`` audio items into .npz latent shards under ``out_dir``.

    Posterior sampling is seeded per-batch (deterministic corpus). Returns shard paths.
    Each shard holds ``latents`` [N, T_lat, C_lat] fp32 (+ ``paths``).
    """
    from foley_tpu.models import dac_vae

    encode = jax.jit(
        lambda p, a, k: dac_vae.encode(p, a, dac_cfg).sample(k),
        static_argnums=(),
    )
    base_key = jax.random.PRNGKey(seed)
    os.makedirs(out_dir, exist_ok=True)
    shards: List[str] = []
    lat_buf: List[np.ndarray] = []
    path_buf: List[str] = []
    done = 0

    def flush():
        nonlocal lat_buf, path_buf
        if not lat_buf:
            return
        path = os.path.join(out_dir, f"shard_{len(shards):05d}.npz")
        np.savez(path, latents=np.concatenate(lat_buf), paths=np.asarray(path_buf))
        shards.append(path)
        lat_buf, path_buf = [], []

    it = iter(dataset)
    while done < num_clips:
        batch = []
        for _ in range(min(batch_size, num_clips - done)):
            batch.append(next(it))
        audio = jnp.asarray(np.stack([b["audio"] for b in batch]))[..., None]  # [B, T, 1]
        # fold the batch index into the key: one fixed key would draw the SAME posterior
        # noise tensor for every batch, correlating corpus latents across batches
        batch_key = jax.random.fold_in(base_key, done)
        z = np.asarray(encode(dac_params, audio, batch_key), np.float32)
        lat_buf.append(z)
        path_buf.extend(b.get("path", "") for b in batch)
        done += len(batch)
        if sum(x.shape[0] for x in lat_buf) >= shard_size:
            flush()
    flush()
    logger.info(f"encoded {done} clips into {len(shards)} shards under {out_dir}")
    return shards


# ---------------------------------------------------------------------------------
# AV (frames + audio) corpus -> encoder-feature shards for V2A training
# ---------------------------------------------------------------------------------

def list_av_clips(root: str) -> List[tuple]:
    """Paired (frames_dir, wav_path) clips under ``root``.

    A clip is a directory of image frames with its audio either inside the directory (a
    single .wav) or as a sibling ``<dirname>.wav``. No video toolchain needed — the same
    frames-dir convention as the CLI/serving V2A ingest (``pipeline/video.py``)."""
    from foley_tpu.pipeline.video import _IMAGE_EXTS

    pairs: List[tuple] = []
    for dirpath, dirnames, _ in os.walk(root):
        for d in sorted(dirnames):
            full = os.path.join(dirpath, d)
            names = os.listdir(full)
            if not any(n.lower().endswith(_IMAGE_EXTS) for n in names):
                continue
            inside = sorted(n for n in names if n.lower().endswith(_WAV_EXTS))
            sibling = full + ".wav"
            if inside:
                pairs.append((full, os.path.join(full, inside[0])))
            elif os.path.exists(sibling):
                pairs.append((full, sibling))
    return pairs


class AVFolderDataset:
    """Infinite sampler of SYNCED fixed-length AV crops from paired frames-dir clips.

    Yields ``{"audio": [Ta] fp32, "frames": [Tv, H, W, 3] fp32 [0,1], "vfps", "afps",
    "path"}`` with audio and frames cut from the same time window (one uniform start per
    draw). Short clips loop (tile) both streams to ``clip_seconds`` before cropping."""

    def __init__(
        self,
        root: str,
        clip_seconds: float,
        sample_rate: int = 48000,
        frames_fps: float = 16.0,
        transforms: Optional[Callable[[dict], dict]] = None,
        seed: int = 0,
    ):
        self.clips = list_av_clips(root)
        if not self.clips:
            raise FileNotFoundError(f"no (frames dir, wav) clip pairs under {root}")
        self.clip_seconds = clip_seconds
        self.sample_rate = sample_rate
        self.frames_fps = frames_fps
        self.transforms = transforms
        self._rng = np.random.default_rng(seed)
        logger.info(f"AVFolderDataset: {len(self.clips)} clips under {root}")

    def __iter__(self) -> Iterator[dict]:
        from foley_tpu.io.audio import read_wav
        from foley_tpu.pipeline.video import read_video_frames

        n_a = int(round(self.clip_seconds * self.sample_rate))
        while True:
            for i in self._rng.permutation(len(self.clips)):
                frames_dir, wav_path = self.clips[int(i)]
                try:
                    audio, _ = read_wav(wav_path, target_sr=self.sample_rate)
                    frames, fps = read_video_frames(frames_dir, dir_fps=self.frames_fps)
                except Exception as e:  # corrupt clip: skip, don't kill the epoch
                    logger.warning(f"skipping unreadable clip {frames_dir}: {e}")
                    continue
                n_v = int(round(self.clip_seconds * fps))
                if len(audio) < n_a:
                    audio = np.tile(audio, int(np.ceil(n_a / max(len(audio), 1))))
                if frames.shape[0] < n_v:
                    frames = np.tile(frames, (int(np.ceil(n_v / max(frames.shape[0], 1))), 1, 1, 1))
                # one shared start keeps the streams synced
                dur = min(len(audio) / self.sample_rate, frames.shape[0] / fps)
                start_s = float(self._rng.uniform(0.0, max(dur - self.clip_seconds, 0.0)))
                a0 = int(round(start_s * self.sample_rate))
                v0 = int(round(start_s * fps))
                item = {
                    "audio": audio[a0 : a0 + n_a],
                    "frames": frames[v0 : v0 + n_v],
                    "vfps": float(fps),
                    "afps": self.sample_rate,
                    "path": frames_dir,
                }
                if self.transforms is not None:
                    item = self.transforms(item)
                yield item


def encode_av_corpus(
    dac_params: Dict,
    dac_cfg,
    video_encoders: Dict,
    pipeline_cfg,
    dataset: Iterator[dict],
    out_dir: str,
    num_clips: int,
    clip_seconds: float,
    shard_size: int = 64,
    seed: int = 0,
) -> List[str]:
    """Offline AV corpus encoding for V2A training: per clip, DAC posterior latents PLUS
    SigLIP2/Synchformer visual features into .npz shards.

    Same recipe as ``encode_corpus`` (precompute the frozen encoders once; train steps
    stream small features instead of re-running ViTs every step), through the SAME encode
    path the sampler uses at inference (``nodes.HunyuanFoleySampler._encode_video`` — fps
    resampling, device preprocessing, feature geometry all identical), so a model trained
    on these shards sees exactly the inference-time V2A conditioning."""
    from foley_tpu.api.nodes import HunyuanFoleySampler
    from foley_tpu.models import dac_vae

    encode = jax.jit(lambda p, a, k: dac_vae.encode(p, a, dac_cfg).sample(k))
    base_key = jax.random.PRNGKey(seed)
    os.makedirs(out_dir, exist_ok=True)
    shards: List[str] = []
    bufs: Dict[str, List[np.ndarray]] = {"latents": [], "clip_feat": [], "sync_feat": []}
    path_buf: List[str] = []

    def flush():
        nonlocal bufs, path_buf
        if not bufs["latents"]:
            return
        path = os.path.join(out_dir, f"shard_{len(shards):05d}.npz")
        np.savez(path, paths=np.asarray(path_buf),
                 **{k: np.stack(v) for k, v in bufs.items()})
        shards.append(path)
        bufs = {k: [] for k in bufs}
        path_buf = []

    it = iter(dataset)
    for done in range(num_clips):
        item = next(it)
        audio = jnp.asarray(item["audio"], jnp.float32)[None, :, None]  # [1, T, 1]
        z = np.asarray(encode(dac_params, audio, jax.random.fold_in(base_key, done)), np.float32)
        clip_feat, sync_feat = HunyuanFoleySampler._encode_video(
            video_encoders, item["frames"], frame_rate=item["vfps"],
            duration=clip_seconds, cfg=pipeline_cfg,
        )
        bufs["latents"].append(z[0])
        bufs["clip_feat"].append(np.asarray(clip_feat, np.float32)[0])
        bufs["sync_feat"].append(np.asarray(sync_feat, np.float32)[0])
        path_buf.append(item.get("path", ""))
        if len(bufs["latents"]) >= shard_size:
            flush()
    flush()
    logger.info(f"encoded {num_clips} AV clips into {len(shards)} shards under {out_dir}")
    return shards


class NpzShardDataset:
    """Infinite shuffled sampler over .npz shards (``encode_corpus`` latents-only shards or
    ``encode_av_corpus`` latents+clip_feat+sync_feat shards — yields every per-row array)."""

    def __init__(self, shard_dir: str, seed: int = 0):
        self.shards = sorted(
            os.path.join(shard_dir, n) for n in os.listdir(shard_dir) if n.endswith(".npz")
        )
        if not self.shards:
            raise FileNotFoundError(f"no .npz shards under {shard_dir}")
        self._rng = np.random.default_rng(seed)

    def __iter__(self) -> Iterator[dict]:
        while True:
            for si in self._rng.permutation(len(self.shards)):
                with np.load(self.shards[int(si)]) as z:
                    arrays = {k: z[k] for k in z.files if k != "paths"}
                for ri in self._rng.permutation(arrays["latents"].shape[0]):
                    yield {k: v[int(ri)] for k, v in arrays.items()}


def latent_stats_from_shards(shard_dir: str) -> tuple:
    """Per-channel (mean, std) over every latent frame in a shard directory.

    Flow matching pairs data with unit-Gaussian noise, so training wants latents at O(1)
    scale (the latent-diffusion "scale factor" recipe). Fine-tuning a *pretrained* MMDiT must
    keep the raw scale it was trained at (identity stats); training from scratch — or against
    an untuned/random DAC, whose latents can be arbitrarily scaled — should standardize with
    these stats and decode through the matching inverse (``latent_stats`` in
    ``flow_match_batches``).
    """
    count = 0
    mean = None
    m2 = None
    for path in sorted(os.path.join(shard_dir, n) for n in os.listdir(shard_dir)
                       if n.endswith(".npz")):
        with np.load(path) as z:
            lat = z["latents"].astype(np.float64)  # [N, T, C]
        flat = lat.reshape(-1, lat.shape[-1])
        if mean is None:
            mean = np.zeros(flat.shape[-1])
            m2 = np.zeros(flat.shape[-1])
        # Chan-style streaming moments (shards may not fit memory together)
        n_new = flat.shape[0]
        delta = flat.mean(0) - mean
        mean += delta * n_new / (count + n_new)
        m2 += flat.var(0) * n_new + delta**2 * count * n_new / (count + n_new)
        count += n_new
    if mean is None:
        raise FileNotFoundError(f"no .npz shards under {shard_dir}")
    std = np.sqrt(m2 / count)
    return mean.astype(np.float32), np.maximum(std, 1e-6).astype(np.float32)


# ---------------------------------------------------------------------------------
# Flow-matching batch assembly
# ---------------------------------------------------------------------------------

def flow_match_batches(
    latent_iter: Iterator[dict],
    mmdit_params: Dict,
    pipeline_cfg,
    batch_size: int,
    text_bucket: int = 77,
    cond_fn: Optional[Callable[[Dict[str, np.ndarray]], np.ndarray]] = None,
    latent_stats: Optional[tuple] = None,
    drop_visual_p: float = 0.0,
    drop_rng: Optional[np.random.Generator] = None,
) -> Iterator[Dict[str, np.ndarray]]:
    """Assemble ``{latents, cond, clip_feat, sync_feat}`` batches for ``flow_match_loss``.

    Items carrying per-clip ``clip_feat``/``sync_feat`` (``encode_av_corpus`` shards) train
    V2A conditioning on real visual features; audio-only items (``encode_corpus`` shards)
    condition on the model's *learned* empty clip/sync sequences at the sampler's T2A
    lengths (the reference's unconditioned branch, ``hifi_foley.py:620-635``) — either way
    the geometry matches inference exactly. ``cond_fn(batch) -> [B, L, condition_dim]``
    supplies real text features (zero text = the uncond text branch otherwise).

    ``drop_visual_p`` replaces each row's visual features with the learned empty sequences
    at that probability (classifier-free-guidance dropout: the CFG sampler contrasts exactly
    these empties against the conditioned branch at inference).

    ``latent_stats=(mean, std)`` (see ``latent_stats_from_shards``) standardizes latents per
    channel before batching — required when training from scratch so the flow-matching
    targets are at the unit-noise scale; leave ``None`` (identity) when fine-tuning a
    pretrained model, which already lives in the raw DAC latent space.
    """
    from foley_tpu.models import mmdit as mmdit_model

    # normalize to an iterator once: with a re-iterable (e.g. a dataset object) the later
    # `yield from latent_iter` would restart it, duplicating the probe item with a
    # diverged RNG stream
    latent_iter = iter(latent_iter)
    probe = next(latent_iter)
    lat_len = probe["latents"].shape[0]
    first = [probe]

    has_visual = "clip_feat" in probe and "sync_feat" in probe
    if has_visual:
        clip_len, sync_len = probe["clip_feat"].shape[0], probe["sync_feat"].shape[0]
    else:
        duration_s = lat_len / pipeline_cfg.model.audio_frame_rate
        clip_len, sync_len = pipeline_cfg.t2a_lengths(duration_s)
    empty_clip = np.asarray(
        mmdit_model.get_empty_clip_sequence(mmdit_params, batch_size, clip_len), np.float32
    )
    empty_sync = np.asarray(
        mmdit_model.get_empty_sync_sequence(mmdit_params, batch_size, sync_len), np.float32
    )
    drop_rng = drop_rng or np.random.default_rng()

    def items():
        yield from first
        yield from latent_iter

    keys = ("latents", "clip_feat", "sync_feat") if has_visual else ("latents",)
    for batch in batch_items(items(), batch_size, keys=keys):
        cond = (
            cond_fn(batch) if cond_fn is not None
            else np.zeros((batch_size, text_bucket, pipeline_cfg.model.condition_dim), np.float32)
        )
        lat = batch["latents"].astype(np.float32)
        if latent_stats is not None:
            mean, std = latent_stats
            lat = (lat - mean) / std
        if has_visual:
            clip_feat = batch["clip_feat"].astype(np.float32)
            sync_feat = batch["sync_feat"].astype(np.float32)
            if drop_visual_p > 0.0:
                drop = drop_rng.random(batch_size) < drop_visual_p
                clip_feat = np.where(drop[:, None, None], empty_clip, clip_feat)
                sync_feat = np.where(drop[:, None, None], empty_sync, sync_feat)
        else:
            clip_feat, sync_feat = empty_clip, empty_sync
        yield {
            "latents": lat,
            "cond": cond,
            "clip_feat": clip_feat,
            "sync_feat": sync_feat,
        }


# ---------------------------------------------------------------------------------
# Device prefetch
# ---------------------------------------------------------------------------------

class PrefetchLoader:
    """Stage upcoming batches on device from a background thread.

    Wraps a host-side batch iterator; a worker thread calls ``jax.device_put`` (with
    ``sharding`` when training over a mesh — e.g. ``NamedSharding(mesh, P('data'))`` leaves)
    up to ``depth`` batches ahead. ``device_put`` is async: the H2D copies overlap the
    in-flight train step, so a fast-enough host never stalls the chip. Iteration ends when
    the source iterator does; call ``close()`` to stop early.
    """

    def __init__(self, batches: Iterator[Dict], depth: int = 2, sharding=None):
        self._src = batches
        self._sharding = sharding
        self._q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._work, daemon=True)
        self._thread.start()

    def _work(self):
        try:
            for batch in self._src:
                if self._stop.is_set():
                    return
                staged = jax.device_put(batch, self._sharding)
                while not self._stop.is_set():
                    try:
                        self._q.put(staged, timeout=0.1)
                        break
                    except queue.Full:
                        continue
            self._q.put(_SENTINEL)
        except Exception as e:  # surface loader errors on the consumer side
            self._q.put(_LoaderError(e))

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is _SENTINEL:
            raise StopIteration
        if isinstance(item, _LoaderError):
            raise item.error
        return item

    def close(self):
        self._stop.set()


_SENTINEL = object()


class _LoaderError:
    def __init__(self, error: BaseException):
        self.error = error
