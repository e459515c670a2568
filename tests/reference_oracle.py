"""Import the reference's LITERAL torch code as a golden oracle.

The transcription goldens (test_mmdit_full_golden, test_dac, test_scheduler) pin our JAX
code against hand-written torch math; if a transcription misreads the reference, both sides
are consistently wrong. This module lets tests import the reference's *actual* modules from
``/root/reference`` by installing ~20-line ``sys.modules`` stubs for the four dependencies
missing in this image (``comfy``, ``diffusers``, ``loguru``, ``audiotools`` + ``argbind``).
Only dependency *shims* are stubbed — every line of model/scheduler math executed by the
oracle tests is the reference's own code.

Reference import surfaces covered (see each file's imports):
- ``hunyuanvideo_foley/models/hifi_foley.py:7-17`` (comfy, loguru, diffusers)
- ``hunyuanvideo_foley/utils/schedulers/scheduling_flow_match_discrete.py:8-10`` (diffusers)
- ``hunyuanvideo_foley/models/dac_vae/{__init__,model/discriminator,utils/__init__}``
  (audiotools, argbind; dac.py itself falls back to the reference's own
  ``_audiotools_stubs`` when audiotools is absent)
"""

from __future__ import annotations

import functools
import importlib
import importlib.machinery
import inspect
import sys
import types

import torch

REF_ROOT = "/root/reference"


def _mk_module(name: str, **attrs) -> types.ModuleType:
    mod = types.ModuleType(name)
    # a real ModuleSpec so importlib.util.find_spec probes (e.g. transformers'
    # _is_package_available("timm")) see a well-formed module instead of raising
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for key, value in attrs.items():
        setattr(mod, key, value)
    sys.modules[name] = mod
    return mod


class _AttrDict(dict):
    """Minimal stand-in for diffusers' FrozenDict: attribute access over init kwargs."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as exc:  # pragma: no cover - mirrors AttributeError contract
            raise AttributeError(name) from exc


def _register_to_config(init):
    """Stub of ``diffusers.configuration_utils.register_to_config``.

    Captures the bound init arguments (with defaults applied) into ``self._internal_dict``
    so the reference code's ``self.config.<field>`` reads work.
    """

    @functools.wraps(init)
    def wrapper(self, *args, **kwargs):
        sig = inspect.signature(init)
        bound = sig.bind(self, *args, **kwargs)
        bound.apply_defaults()
        cfg = {k: v for k, v in bound.arguments.items() if k != "self"}
        object.__setattr__(self, "_internal_dict", _AttrDict(cfg))
        init(self, *args, **kwargs)

    return wrapper


class _ConfigMixin:
    @property
    def config(self):
        return self._internal_dict


class _ModelMixin(torch.nn.Module):
    @property
    def dtype(self) -> torch.dtype:
        """diffusers ModelMixin.dtype: first parameter's dtype (utils.py:143 reads it)."""
        return next(self.parameters()).dtype

    @property
    def device(self) -> torch.device:
        return next(self.parameters()).device


class _SchedulerMixin:
    pass


class _BaseOutput:
    """diffusers BaseOutput contract slice: int indexing walks the dataclass fields in
    order (``scheduler.step(...)[0]`` in utils.py:246), str indexing reads by name."""

    def __getitem__(self, key):
        import dataclasses as _dc

        if isinstance(key, str):
            return getattr(self, key)
        if _dc.is_dataclass(self):
            values = tuple(getattr(self, f.name) for f in _dc.fields(self))
        else:
            values = tuple(vars(self).values())
        return values[key]


class _STFTParams:
    """audiotools.STFTParams: a plain field bag; ``None`` fields fall back to the signal's
    defaults inside ``AudioSignal.stft`` (descript-audiotools semantics)."""

    def __init__(self, window_length=None, hop_length=None, window_type=None,
                 match_stride=None, padding_type=None):
        self.window_length = window_length
        self.hop_length = hop_length
        self.window_type = window_type
        self.match_stride = match_stride
        self.padding_type = padding_type


class _AudioSignal:
    """Functional audiotools.AudioSignal stub covering exactly the surface the reference's
    DAC discriminator/loss modules call (``dac_vae/model/discriminator.py``,
    ``dac_vae/nn/loss.py``): ``audio_data``, ``stft`` (incl. match_stride pad/trim),
    ``magnitude``, ``mel_spectrogram`` (magnitude-mel, librosa-slaney basis), identity
    ``resample``, ``clone``/``detach``.

    audiotools itself is absent in this image; these semantics are transcribed from
    descript-audiotools (AudioSignal.stft: reflect pad ((w-h)//2, (w-h)//2 + ceil(T/h)*h - T)
    when match_stride, then a centered torch.stft, then drop 2 frames each side;
    mel_spectrogram: |stft| @ librosa mel basis). This transcription is the documented
    shared-assumption boundary of the literal-reference GAN oracle — every line of
    discriminator/loss math above it is the reference's own code.
    """

    def __init__(self, audio_data, sample_rate, stft_params=None):
        if not torch.is_tensor(audio_data):
            audio_data = torch.as_tensor(audio_data)
        if audio_data.ndim == 1:
            audio_data = audio_data[None, None]
        elif audio_data.ndim == 2:
            audio_data = audio_data[:, None]
        self.audio_data = audio_data
        self.sample_rate = sample_rate
        self.stft_params = stft_params or _STFTParams(
            window_length=2048, hop_length=512, window_type="hann",
            match_stride=False, padding_type="reflect",
        )
        self.stft_data = None

    @property
    def batch_size(self):
        return self.audio_data.shape[0]

    @property
    def num_channels(self):
        return self.audio_data.shape[1]

    @property
    def signal_length(self):
        return self.audio_data.shape[-1]

    def resample(self, sample_rate):
        if sample_rate != self.sample_rate:
            raise NotImplementedError(
                "oracle AudioSignal stub only supports identity resample (MSD rate=1); "
                "rate>1 polyphase resampling is a documented divergence (PARITY.md)"
            )
        return self

    def clone(self):
        sig = _AudioSignal(self.audio_data.clone(), self.sample_rate, self.stft_params)
        return sig

    def detach(self):
        self.audio_data = self.audio_data.detach()
        return self

    def stft(self, window_length=None, hop_length=None, window_type=None,
             match_stride=None, padding_type=None):
        w = window_length if window_length is not None else self.stft_params.window_length
        h = hop_length if hop_length is not None else self.stft_params.hop_length
        wt = window_type if window_type is not None else self.stft_params.window_type
        ms = match_stride if match_stride is not None else self.stft_params.match_stride
        pt = padding_type if padding_type is not None else self.stft_params.padding_type
        wt = wt or "hann"
        pt = pt or "reflect"
        ms = bool(ms)
        if wt != "hann":
            raise NotImplementedError(f"oracle stub supports hann windows only, got {wt}")
        if ms:
            assert h == w // 4, "match_stride requires hop == window//4 (audiotools)"
            t = self.signal_length
            right_pad = -(-t // h) * h - t
            pad = (w - h) // 2
        else:
            right_pad = 0
            pad = 0
        x = torch.nn.functional.pad(self.audio_data, (pad, pad + right_pad), pt)
        window = torch.hann_window(w, periodic=True, dtype=x.dtype)
        stft_data = torch.stft(
            x.reshape(-1, x.shape[-1]), n_fft=w, hop_length=h, window=window,
            return_complex=True, center=True,
        )
        _, nf, nt = stft_data.shape
        stft_data = stft_data.reshape(self.batch_size, self.num_channels, nf, nt)
        if ms:
            stft_data = stft_data[..., 2:-2]
        self.stft_data = stft_data
        return stft_data

    @property
    def magnitude(self):
        if self.stft_data is None:
            self.stft()
        return torch.abs(self.stft_data)

    def mel_spectrogram(self, n_mels, mel_fmin=0.0, mel_fmax=None, **kwargs):
        from foley_tpu.ops.audio_dsp import mel_filterbank_slaney_np

        mag = torch.abs(self.stft(**kwargs))                       # [b, c, f, t]
        nf = mag.shape[2]
        fb = mel_filterbank_slaney_np(nf, n_mels, self.sample_rate, mel_fmin, mel_fmax)
        basis = torch.from_numpy(fb).to(mag.dtype)                 # [f, m]
        mel = mag.transpose(2, -1) @ basis                         # [b, c, t, m]
        return mel.transpose(-1, 2)                                # [b, c, m, t]


class _NullLogger:
    def _log(self, *a, **k):
        pass

    info = debug = warning = error = success = trace = _log


class _ProgressBar:
    def __init__(self, total=0):
        self.total = total

    def update(self, *a, **k):
        pass

    def update_absolute(self, *a, **k):
        pass


class _OmegaNode(dict):
    """Attribute-access dict mirroring the slice of omegaconf the reference uses:
    nested attribute reads (``cfg.VIT.EMBED_DIM``) and assignment
    (``motionformer.py:105-110`` patches loaded cfg fields in place)."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as exc:
            raise AttributeError(name) from exc

    def __setattr__(self, name, value):
        self[name] = value


def _omega_wrap(obj):
    if isinstance(obj, dict):
        return _OmegaNode({k: _omega_wrap(v) for k, v in obj.items()})
    if isinstance(obj, list):
        return [_omega_wrap(v) for v in obj]
    return obj


class _OmegaConf:
    @staticmethod
    def load(path):
        import yaml

        with open(path) as f:
            return _omega_wrap(yaml.safe_load(f))


def _to_2tuple(x):
    return x if isinstance(x, tuple) else (x, x)


class _TVModule(torch.nn.Module):
    """Subclassable torchvision placeholder: ``data_transforms.py`` defines classes that
    INHERIT from torchvision transforms (Resize/RandomHorizontalFlip/Normalize) at module
    scope, so import needs real classes — but the oracle tests only exercise the pure-torch
    transforms, so any forward through a torchvision base raises loudly instead of silently
    shimming torchvision math."""

    def __init__(self, *args, **kwargs):
        super().__init__()

    def forward(self, *args, **kwargs):  # pragma: no cover - guards accidental use
        raise RuntimeError("torchvision stub: this reference path is not oracle-able here")


def _tv_unavailable(*_a, **_k):  # pragma: no cover - guards accidental use
    raise RuntimeError("torchvision stub: functional API unavailable")


def install_torchvision_stub() -> None:
    """Import-only torchvision stub so ``synchformer/data_transforms.py`` imports clean."""
    if "torchvision" in sys.modules and not getattr(
        sys.modules["torchvision"], "_foley_tpu_stub", False
    ):
        raise RuntimeError("real torchvision present; oracle stubs would shadow it")
    if "torchvision" in sys.modules:
        return
    tv = _mk_module("torchvision", _foley_tpu_stub=True)
    names = (
        "Resize", "RandomHorizontalFlip", "Normalize", "Compose", "RandomApply",
        "ColorJitter", "RandomGrayscale",
    )
    tv.transforms = _mk_module(
        "torchvision.transforms",
        **{n: type(n, (_TVModule,), {}) for n in names},
    )
    tv.transforms.functional = _mk_module(
        "torchvision.transforms.functional", resize=_tv_unavailable
    )


def install_sync_stubs() -> None:
    """Stubs for the Synchformer import chain's missing deps (omegaconf/timm/torchaudio).

    Only loaders/initializers are stubbed: OmegaConf.load is a plain YAML reader feeding the
    reference's own divided_224_16x4.yaml, timm contributes ``trunc_normal_`` (torch's own)
    and ``to_2tuple`` (init-time only), and torchaudio is referenced solely in
    ``synchformer.py``'s mel-spectrogram helpers, which the oracle tests never call.
    """
    install_torchvision_stub()
    for name in ("omegaconf", "timm", "torchaudio"):
        if name in sys.modules and not getattr(sys.modules[name], "_foley_tpu_stub", False):
            raise RuntimeError(f"real {name} present; oracle stubs would shadow it")
    if "omegaconf" not in sys.modules:
        _mk_module("omegaconf", OmegaConf=_OmegaConf, _foley_tpu_stub=True)
    if "timm" not in sys.modules:
        timm = _mk_module("timm", _foley_tpu_stub=True)
        timm.layers = _mk_module(
            "timm.layers", trunc_normal_=torch.nn.init.trunc_normal_, to_2tuple=_to_2tuple
        )
        timm.models = _mk_module("timm.models")
        timm.models.layers = _mk_module(
            "timm.models.layers", trunc_normal_=torch.nn.init.trunc_normal_, to_2tuple=_to_2tuple
        )
    if "torchaudio" not in sys.modules:
        ta = _mk_module("torchaudio", _foley_tpu_stub=True)
        ta.transforms = _mk_module(
            "torchaudio.transforms",
            MelSpectrogram=type("MelSpectrogram", (), {}),
            Resample=type("Resample", (), {}),
        )
        ta.load = None  # only called from file-loading helpers the oracle never exercises


def install_stubs() -> None:
    """Install sys.modules stubs for comfy/diffusers/loguru/audiotools/argbind (idempotent)."""
    install_sync_stubs()
    if "diffusers" in sys.modules and not getattr(sys.modules["diffusers"], "_foley_tpu_stub", False):
        raise RuntimeError("real diffusers present; oracle stubs would shadow it")
    if "diffusers" in sys.modules:
        return

    logger = _NullLogger()

    diffusers = _mk_module("diffusers", _foley_tpu_stub=True)
    diffusers.models = _mk_module("diffusers.models", ModelMixin=_ModelMixin)
    diffusers.configuration_utils = _mk_module(
        "diffusers.configuration_utils",
        ConfigMixin=_ConfigMixin,
        register_to_config=_register_to_config,
    )
    diffusers.utils = _mk_module(
        "diffusers.utils",
        BaseOutput=_BaseOutput,
        logging=types.SimpleNamespace(get_logger=lambda *_a, **_k: logger),
    )

    def _randn_tensor(shape, generator=None, device=None, dtype=None, layout=None):
        """diffusers.utils.torch_utils.randn_tensor for the CPU oracle: seeded torch.randn
        (the real helper adds device juggling the CPU path doesn't reach)."""
        return torch.randn(tuple(shape), generator=generator, dtype=dtype)

    diffusers.utils.torch_utils = _mk_module(
        "diffusers.utils.torch_utils", randn_tensor=_randn_tensor
    )
    diffusers.schedulers = _mk_module(
        "diffusers.schedulers",
        DDPMScheduler=type("DDPMScheduler", (), {}),
        EulerDiscreteScheduler=type("EulerDiscreteScheduler", (), {}),
    )
    diffusers.schedulers.scheduling_utils = _mk_module(
        "diffusers.schedulers.scheduling_utils", SchedulerMixin=_SchedulerMixin
    )

    comfy = _mk_module("comfy")
    comfy.model_management = _mk_module(
        "comfy.model_management",
        get_torch_device=lambda: torch.device("cpu"),
        unet_offload_device=lambda: torch.device("cpu"),
        soft_empty_cache=lambda *a, **k: None,
    )
    comfy.utils = _mk_module(
        "comfy.utils",
        ProgressBar=_ProgressBar,
        load_torch_file=lambda path, device=None, **_k: torch.load(path, map_location="cpu"),
    )

    # PyAV: imported at feature_utils.py:6 module scope; only av.open bodies use it, which
    # the oracle never calls (frame ingest is exercised through our own pipeline/video.py).
    if "av" not in sys.modules:
        _mk_module("av", _foley_tpu_stub=True)

    _mk_module("loguru", logger=logger)

    class _BaseModel(torch.nn.Module):
        INTERN = []
        EXTERN = []

    audiotools = _mk_module(
        "audiotools",
        AudioSignal=_AudioSignal,
        STFTParams=_STFTParams,
    )
    audiotools.ml = _mk_module(
        "audiotools.ml", BaseModel=_BaseModel, Accelerator=type("Accelerator", (), {})
    )

    def _bind(*_a, **_k):
        def deco(fn):
            return fn

        return deco

    _mk_module("argbind", bind=_bind)


def import_reference(module_name: str):
    """Import ``module_name`` (e.g. 'hunyuanvideo_foley.models.hifi_foley') from /root/reference."""
    install_stubs()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    return importlib.import_module(module_name)


def make_model_config(**model_kwargs):
    """Build the nested ``model_config.model_config.model_kwargs`` object hifi_foley expects
    (``hifi_foley.py:402``)."""
    return types.SimpleNamespace(
        model_config=types.SimpleNamespace(model_kwargs=dict(model_kwargs))
    )
