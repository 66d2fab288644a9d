"""Conditioning subsystem: attributes, tokenizers, conditioners, provider,
fuser, and CFG/attribute dropouts.

Parity: `audiocraft/modules/conditioners.py:40-1763` (see docs/CONDITIONING.md
in the reference). Covered here: condition data types + nullify helpers,
WhiteSpace/Noop tokenizers, LUTConditioner, T5Conditioner (native JAX T5
encoder from `modules/t5.py`), ConditioningProvider, ConditionFuser
(sum/prepend/cross/ignore/input_interpolate), AttributeDropout and
ClassifierFreeGuidanceDropout.

TPU-first split: everything string/list-shaped (tokenize, dropouts, collate)
is host-side numpy; `ConditioningProvider.__call__` is the only device step
and returns dense `(embedding [B,T,D], mask [B,T])` pairs that jit cleanly.

Divergence (documented): the reference's WhiteSpaceTokenizer lemmatizes with
spaCy and expands numbers with num2words (`conditioners.py:247-313`); neither
is in this image, so we normalize with lowercase/punctuation-strip only. The
hash-trick vocabulary is preserved.
"""
import dataclasses
import math
import logging
import re
import typing as tp
from collections import defaultdict
from copy import deepcopy
from itertools import chain
from pathlib import Path

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..utils.utils import hash_trick, length_to_mask
from .transformer import create_sin_embedding

logger = logging.getLogger(__name__)
TextCondition = tp.Optional[str]
# condition, mask — embedding [B, T, D] and validity mask [B, T]
ConditionType = tp.Tuple[jax.Array, jax.Array]


class WavCondition(tp.NamedTuple):
    """Reference `conditioners.py:55-61`. wav: [B, C, T] host array."""
    wav: np.ndarray
    length: np.ndarray
    sample_rate: tp.List[int]
    path: tp.List[tp.Optional[str]] = []
    seek_time: tp.List[tp.Optional[float]] = []


class JointEmbedCondition(tp.NamedTuple):
    wav: np.ndarray
    text: tp.List[tp.Optional[str]]
    length: np.ndarray
    sample_rate: tp.List[int]
    path: tp.List[tp.Optional[str]] = []
    seek_time: tp.List[tp.Optional[float]] = []


class SymbolicCondition(tp.NamedTuple):
    frame_chords: tp.Optional[np.ndarray] = None
    melody: tp.Optional[np.ndarray] = None


@dataclasses.dataclass
class ConditioningAttributes:
    """Reference `conditioners.py:78-124`."""
    text: tp.Dict[str, tp.Optional[str]] = dataclasses.field(default_factory=dict)
    wav: tp.Dict[str, WavCondition] = dataclasses.field(default_factory=dict)
    joint_embed: tp.Dict[str, JointEmbedCondition] = dataclasses.field(default_factory=dict)
    symbolic: tp.Dict[str, SymbolicCondition] = dataclasses.field(default_factory=dict)

    def __getitem__(self, item):
        return getattr(self, item)

    @property
    def text_attributes(self):
        return self.text.keys()

    @property
    def wav_attributes(self):
        return self.wav.keys()

    @property
    def joint_embed_attributes(self):
        return self.joint_embed.keys()

    @property
    def symbolic_attributes(self):
        return self.symbolic.keys()

    @property
    def attributes(self):
        return {"text": self.text_attributes, "wav": self.wav_attributes,
                "joint_embed": self.joint_embed_attributes,
                "symbolic": self.symbolic_attributes}

    def to_flat_dict(self):
        return {**{f"text.{k}": v for k, v in self.text.items()},
                **{f"wav.{k}": v for k, v in self.wav.items()},
                **{f"joint_embed.{k}": v for k, v in self.joint_embed.items()},
                **{f"symbolic.{k}": v for k, v in self.symbolic.items()}}

    @classmethod
    def from_flat_dict(cls, x):
        out = cls()
        for k, v in x.items():
            kind, att = k.split(".")
            out[kind][att] = v
        return out


# ----------------------------------------------------------------- nullify

def nullify_condition(condition: tp.Tuple[np.ndarray, np.ndarray], dim: int = 1):
    """Zero-length null condition (`conditioners.py:138-163`)."""
    cond, _ = condition
    B = cond.shape[0]
    out = np.moveaxis(cond, dim, -1)
    out = 0.0 * out[..., :1]
    out = np.moveaxis(out, -1, dim)
    mask = np.zeros((B, 1), dtype=np.int32)
    return out, mask


def nullify_wav(cond: WavCondition) -> WavCondition:
    """`conditioners.py:166-182`."""
    null_wav, _ = nullify_condition((cond.wav, np.zeros_like(cond.wav)),
                                    dim=cond.wav.ndim - 1)
    B = cond.wav.shape[0]
    return WavCondition(wav=null_wav, length=np.zeros(B, dtype=np.int64),
                        sample_rate=cond.sample_rate, path=[None] * B,
                        seek_time=[None] * B)


def nullify_joint_embed(embed: JointEmbedCondition) -> JointEmbedCondition:
    """`conditioners.py:185-199`."""
    null_wav, _ = nullify_condition((embed.wav, np.zeros_like(embed.wav)),
                                    dim=embed.wav.ndim - 1)
    return JointEmbedCondition(
        wav=null_wav, text=[None] * len(embed.text),
        length=np.zeros(embed.wav.shape[0], dtype=np.int64),
        sample_rate=embed.sample_rate, path=[None] * embed.wav.shape[0],
        seek_time=[0] * embed.wav.shape[0])


def nullify_chords(sym_cond: SymbolicCondition, null_chord_idx: int = 194) -> SymbolicCondition:
    return SymbolicCondition(frame_chords=np.ones_like(sym_cond.frame_chords) * null_chord_idx)


def nullify_melody(sym_cond: SymbolicCondition) -> SymbolicCondition:
    return SymbolicCondition(melody=np.zeros_like(sym_cond.melody))


# --------------------------------------------------------------- tokenizers

class Tokenizer:
    def __call__(self, texts: tp.List[tp.Optional[str]]
                 ) -> tp.Tuple[np.ndarray, np.ndarray]:
        raise NotImplementedError()


class WhiteSpaceTokenizer(Tokenizer):
    """Hash-trick whitespace tokenizer (`conditioners.py:247-313`, minus the
    spaCy lemmatization — see module docstring)."""
    PUNCTUATION = "?:!.,;"

    def __init__(self, n_bins: int, pad_idx: int = 0, lemma: bool = True,
                 stopwords: bool = True):
        self.n_bins = n_bins
        self.pad_idx = pad_idx

    def __call__(self, texts: tp.List[tp.Optional[str]]):
        output, lengths = [], []
        for text in texts:
            if text is None:
                output.append([self.pad_idx])
                lengths.append(0)
                continue
            text = re.sub(f"[{re.escape(self.PUNCTUATION)}]", "", text.lower())
            words = text.split()
            lengths.append(len(words))
            output.append([hash_trick(w, self.n_bins) for w in words] or [self.pad_idx])
        mask = length_to_mask(np.array(lengths))
        max_len = mask.shape[1]
        padded = np.full((len(output), max_len), self.pad_idx, dtype=np.int32)
        for i, toks in enumerate(output):
            padded[i, :len(toks)] = toks[:max_len]
        return padded, mask


class NoopTokenizer(Tokenizer):
    """One index per whole string (`conditioners.py:316-344`)."""

    def __init__(self, n_bins: int, pad_idx: int = 0):
        self.n_bins = n_bins
        self.pad_idx = pad_idx

    def __call__(self, texts: tp.List[tp.Optional[str]]):
        output, lengths = [], []
        for text in texts:
            if text is None:
                output.append(self.pad_idx)
                lengths.append(0)
            else:
                output.append(hash_trick(text, self.n_bins))
                lengths.append(1)
        tokens = np.array(output, dtype=np.int32)[:, None]
        mask = length_to_mask(np.array(lengths))
        return tokens, mask


# -------------------------------------------------------------- conditioners

class BaseConditioner(nn.Module):
    """Base conditioner (`conditioners.py:346-380`): host `tokenize` +
    device `__call__`, optional output projection."""
    dim: int = 0
    output_dim: int = 0
    dtype: tp.Any = jnp.float32
    param_dtype: tp.Any = jnp.float32

    def _output_proj(self, x: jax.Array) -> jax.Array:
        if self.output_dim > -1:
            return nn.Dense(self.output_dim, dtype=self.dtype,
                            param_dtype=self.param_dtype, name="output_proj")(x)
        return x

    def tokenize(self, *args, **kwargs) -> tp.Any:
        raise NotImplementedError()


class TextConditioner(BaseConditioner):
    ...


class LUTConditioner(TextConditioner):
    """Lookup-table text conditioner (`conditioners.py:387-419`)."""
    n_bins: int = 0
    tokenizer: str = "noop"
    pad_idx: int = 0

    def _get_tokenizer(self) -> Tokenizer:
        if self.tokenizer == "whitespace":
            return WhiteSpaceTokenizer(self.n_bins, pad_idx=self.pad_idx)
        elif self.tokenizer == "noop":
            return NoopTokenizer(self.n_bins, pad_idx=self.pad_idx)
        raise ValueError(f"unrecognized tokenizer `{self.tokenizer}`.")

    def tokenize(self, x: tp.List[tp.Optional[str]]):
        return self._get_tokenizer()(x)

    @nn.compact
    def __call__(self, inputs) -> ConditionType:
        tokens, mask = inputs
        embeds = nn.Embed(self.n_bins, self.dim, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="embed")(
            jnp.asarray(tokens))
        embeds = self._output_proj(embeds)
        mask = jnp.asarray(mask)
        embeds = embeds * mask[..., None].astype(embeds.dtype)
        return embeds, mask


class T5Conditioner(TextConditioner):
    """T5-encoder text conditioner (`conditioners.py:422-569`).

    The encoder is a native JAX T5 (`modules/t5.py`); pretrained weights load
    from a local HF checkpoint via `models/loaders.py`. The sentencepiece
    tokenizer is host-side via `transformers` (needs a local vocab; a
    hash-trick fallback keeps debug models hermetic).
    """
    # NB: called `name` in the reference config schema, but `name` is flax's
    # reserved module-path attribute (a nested module would silently see
    # "conditioners_description"); the builder maps the config key over.
    model_name: str = "t5-base"
    finetune: bool = False
    word_dropout: float = 0.0
    normalize_text: bool = False

    MODELS_DIMS = {"t5-small": 512, "t5-base": 768, "t5-large": 1024,
                   "t5-3b": 1024, "t5-11b": 1024,
                   "google/flan-t5-small": 512, "google/flan-t5-base": 768,
                   "google/flan-t5-large": 1024, "google/flan-t5-3b": 1024,
                   "google/flan-t5-11b": 1024}

    def _get_tokenizer(self):
        try:
            from transformers import T5Tokenizer  # host-side sentencepiece
            return T5Tokenizer.from_pretrained(self.model_name)
        except Exception as e:  # zero-egress / no local vocab: fall back
            logger.warning("T5 tokenizer unavailable (%s); using hash fallback", e)
            return None

    def tokenize(self, x: tp.List[tp.Optional[str]]):
        entries = [xi if xi is not None else "" for xi in x]
        tok = self._get_tokenizer()
        if tok is not None:
            inputs = tok(entries, return_tensors="np", padding=True)
            mask = inputs["attention_mask"].astype(np.int32)
            mask[np.array([not e for e in entries])] = 0
            return inputs["input_ids"].astype(np.int32), mask
        wst = WhiteSpaceTokenizer(n_bins=32128)
        return wst([xi if xi else None for xi in x])

    @nn.compact
    def __call__(self, inputs) -> ConditionType:
        from .t5 import T5EncoderConfig, T5Encoder
        tokens, mask = inputs
        cfg = T5EncoderConfig.for_model(self.model_name)
        embeds = T5Encoder(cfg, dtype=self.dtype, param_dtype=self.param_dtype,
                           name="t5")(jnp.asarray(tokens), jnp.asarray(mask))
        if not self.finetune:
            embeds = jax.lax.stop_gradient(embeds)
        embeds = self._output_proj(embeds.astype(self.dtype))
        mask = jnp.asarray(mask)
        embeds = embeds * mask[..., None].astype(embeds.dtype)
        return embeds, mask


class WaveformConditioner(BaseConditioner):
    """Base for conditioners operating on waveforms
    (`conditioners.py:571-620`): subclasses implement `_get_wav_embedding`
    and optional downsampling; tokenize passes the WavCondition through."""

    def tokenize(self, x: WavCondition) -> WavCondition:
        return x


# ----------------------------------------------------------------- dropouts

def dropout_condition(sample: ConditioningAttributes, condition_type: str,
                      condition: str) -> ConditioningAttributes:
    """Nullify one attribute in-place (`conditioners.py:1337-1377`)."""
    if condition_type not in ["text", "wav", "joint_embed", "symbolic"]:
        raise ValueError(f"unexpected condition type: {condition_type}")
    if condition not in getattr(sample, condition_type):
        raise ValueError(f"unexpected condition {condition}.{condition_type}")
    if condition_type == "wav":
        sample.wav[condition] = nullify_wav(sample.wav[condition])
    elif condition_type == "joint_embed":
        sample.joint_embed[condition] = nullify_joint_embed(sample.joint_embed[condition])
    elif condition_type == "symbolic":
        sym = sample.symbolic[condition]
        if sym.frame_chords is not None:
            sample.symbolic[condition] = nullify_chords(sym)
        else:
            sample.symbolic[condition] = nullify_melody(sym)
    else:
        sample.text[condition] = None
    return sample


class AttributeDropout:
    """Independent per-attribute dropout (`conditioners.py:1380-1426`).
    Host-side, numpy RNG."""

    def __init__(self, p: tp.Dict[str, tp.Dict[str, float]],
                 active_on_eval: bool = False, seed: int = 1234):
        self.active_on_eval = active_on_eval
        self.p = {ct: defaultdict(lambda: 0, probs) for ct, probs in p.items()}
        self.rng = np.random.RandomState(seed)
        self.training = True

    def __call__(self, samples: tp.List[ConditioningAttributes]
                 ) -> tp.List[ConditioningAttributes]:
        if not self.training and not self.active_on_eval:
            return samples
        samples = deepcopy(samples)
        for condition_type, ps in self.p.items():
            for condition, p in ps.items():
                if self.rng.rand() < p:
                    for sample in samples:
                        dropout_condition(sample, condition_type, condition)
        return samples

    def __repr__(self):
        return f"AttributeDropout({dict(self.p)})"


class ClassifierFreeGuidanceDropout:
    """All-or-nothing condition dropout (`conditioners.py:1427-1467`)."""

    def __init__(self, p: float, seed: int = 1234):
        self.p = p
        self.rng = np.random.RandomState(seed)
        self.training = True

    def __call__(self, samples: tp.List[ConditioningAttributes],
                 cond_types: tp.List[str] = ["wav", "text"]
                 ) -> tp.List[ConditioningAttributes]:
        if not self.training and self.p < 1.0:
            return samples
        drop = self.rng.rand() < self.p
        if not drop:
            return samples
        samples = deepcopy(samples)
        for condition_type in cond_types:
            for sample in samples:
                for condition in list(sample.attributes[condition_type]):
                    dropout_condition(sample, condition_type, condition)
        return samples

    def __repr__(self):
        return f"ClassifierFreeGuidanceDropout(p={self.p})"


def drop_description_condition(conditions: tp.List[ConditioningAttributes]
                               ) -> tp.List[ConditioningAttributes]:
    """Drop text but keep wav, for double-CFG (`conditioners.py:222-236`)."""
    for condition in conditions:
        assert "description" in condition.text.keys()
        assert "self_wav" in condition.wav.keys()
    dropper = AttributeDropout(p={"text": {"description": 1.0},
                                  "wav": {"self_wav": 0.0}})
    dropper.active_on_eval = True
    return dropper(conditions)


# ------------------------------------------------------------------ provider

class ConditioningProvider(nn.Module):
    """Aggregates conditioners; host `tokenize` + device forward
    (`conditioners.py:1469-1545`)."""
    conditioners: tp.Dict[str, BaseConditioner]

    @property
    def text_conditions(self):
        return [k for k, v in self.conditioners.items()
                if isinstance(v, TextConditioner)]

    @property
    def wav_conditions(self):
        return [k for k, v in self.conditioners.items()
                if isinstance(v, WaveformConditioner)]

    @property
    def has_wav_condition(self):
        return len(self.wav_conditions) > 0

    @property
    def joint_embed_conditions(self):
        return [k for k, v in self.conditioners.items()
                if isinstance(v, JointEmbeddingConditioner)]

    @property
    def has_joint_embed_conditions(self):
        return len(self.joint_embed_conditions) > 0

    def tokenize(self, inputs: tp.List[ConditioningAttributes]) -> tp.Dict[str, tp.Any]:
        assert all(isinstance(x, ConditioningAttributes) for x in inputs)
        output = {}
        text = self._collate_text(inputs)
        wavs = self._collate_wavs(inputs)
        joint = self._collate_joint_embeds(inputs)
        assert set(text.keys() | wavs.keys() | joint.keys()).issubset(
            set(self.conditioners.keys())), \
            (f"Got an unexpected attribute! Expected {self.conditioners.keys()}, "
             f"got {text.keys(), wavs.keys(), joint.keys()}")
        for attribute, batch in chain(text.items(), wavs.items(),
                                      joint.items()):
            output[attribute] = self.conditioners[attribute].tokenize(batch)
        return output

    def __call__(self, tokenized: tp.Dict[str, tp.Any]) -> tp.Dict[str, ConditionType]:
        output = {}
        for attribute, inputs in tokenized.items():
            output[attribute] = self.conditioners[attribute](inputs)
        return output

    def _collate_text(self, samples):
        out = defaultdict(list)
        texts = [x.text for x in samples]
        for text in texts:
            for condition in self.text_conditions:
                out[condition].append(text.get(condition))
        return out

    def _collate_wavs(self, samples):
        """Per-attribute stacked WavCondition (`conditioners.py:1570-1620`)."""
        wavs = defaultdict(list)
        lengths = defaultdict(list)
        sample_rates = defaultdict(list)
        paths = defaultdict(list)
        seek_times = defaultdict(list)
        out: tp.Dict[str, WavCondition] = {}
        # only collate attributes with a registered waveform conditioner
        # (`conditioners.py:1596-1598`)
        for sample in samples:
            for attribute in self.wav_conditions:
                wav, length, sample_rate, path, seek_time = sample.wav[attribute]
                assert wav.ndim == 3, f"Expecting wav to be [1, C, T], got {wav.shape}"
                assert wav.shape[0] == 1, "Expecting single-item batch"
                wav = np.asarray(wav).mean(axis=1, keepdims=True)  # mono
                wavs[attribute].append(wav.reshape(-1))  # [T]
                lengths[attribute].append(np.asarray(length).reshape(-1))
                sample_rates[attribute].extend(sample_rate)
                paths[attribute].extend(path)
                seek_times[attribute].extend(seek_time)
        for attribute in self.wav_conditions:
            max_len = max(w.shape[-1] for w in wavs[attribute])
            stacked = np.stack([
                np.pad(w, (0, max_len - w.shape[-1])) for w in wavs[attribute]])
            out[attribute] = WavCondition(
                stacked[:, None], np.concatenate(lengths[attribute]),
                sample_rates[attribute], paths[attribute], seek_times[attribute])
        return out

    def _collate_joint_embeds(self, samples):
        """Batch JointEmbedCondition per attribute (`conditioners.py:1622-1668`)."""
        out: tp.Dict[str, JointEmbedCondition] = {}
        for attribute in self.joint_embed_conditions:
            wavs, texts, lengths, srs, paths, seeks = [], [], [], [], [], []
            null = JointEmbedCondition(
                wav=np.zeros((1, 1, 1), np.float32), text=[None],
                length=np.array([0]), sample_rate=[0], path=[None],
                seek_time=[None])
            for sample in samples:
                cond = sample.joint_embed.get(attribute, null)
                wav = np.asarray(cond.wav).mean(axis=1, keepdims=True)
                wavs.append(wav.reshape(-1))
                texts.extend(cond.text)
                lengths.append(np.asarray(cond.length).reshape(-1))
                srs.extend(cond.sample_rate)
                paths.extend(cond.path)
                seeks.extend(cond.seek_time)
            max_len = max(w.shape[-1] for w in wavs)
            stacked = np.stack([np.pad(w, (0, max_len - w.shape[-1]))
                                for w in wavs])
            out[attribute] = JointEmbedCondition(
                stacked[:, None], texts, np.concatenate(lengths), srs,
                paths, seeks)
        return out


# -------------------------------------------------------------------- fuser

class ConditionFuser:
    """Fuse conditions into the model input (`conditioners.py:1672-1763`).

    Stateless: callers pass `first_step=False` for incremental decode steps so
    `prepend` only applies at prefill.
    """
    FUSING_METHODS = ["sum", "prepend", "cross", "ignore", "input_interpolate"]

    def __init__(self, fuse2cond: tp.Dict[str, tp.List[str]],
                 cross_attention_pos_emb: bool = False,
                 cross_attention_pos_emb_scale: float = 1.0):
        assert all(k in self.FUSING_METHODS for k in fuse2cond.keys()), \
            f"Got invalid fuse method, allowed methods: {self.FUSING_METHODS}"
        self.cross_attention_pos_emb = cross_attention_pos_emb
        self.cross_attention_pos_emb_scale = cross_attention_pos_emb_scale
        self.fuse2cond = {k: list(v) for k, v in fuse2cond.items()}
        self.cond2fuse: tp.Dict[str, str] = {}
        for fuse_method, conditions in fuse2cond.items():
            for condition in conditions:
                self.cond2fuse[condition] = fuse_method

    @property
    def has_prepend(self) -> bool:
        return bool(self.fuse2cond.get("prepend"))

    def __call__(self, input: jax.Array,
                 conditions: tp.Dict[str, ConditionType],
                 first_step: bool = True
                 ) -> tp.Tuple[jax.Array, tp.Optional[jax.Array]]:
        assert set(conditions.keys()).issubset(set(self.cond2fuse.keys())), \
            (f"given conditions contain unknown attributes for fuser, "
             f"expected {self.cond2fuse.keys()}, got {conditions.keys()}")
        cross_attention_output = None
        for cond_type, (cond, cond_mask) in conditions.items():
            op = self.cond2fuse[cond_type]
            cond = cond.astype(input.dtype)
            if op == "sum":
                input = input + cond
            elif op == "input_interpolate":
                # nearest-exact resample of cond time axis to input length
                T_in = input.shape[1]
                idx = (jnp.arange(T_in) * cond.shape[1] // T_in)
                input = input + jnp.take(cond, idx, axis=1)
            elif op == "prepend":
                if first_step:
                    input = jnp.concatenate([cond, input], axis=1)
            elif op == "cross":
                if cross_attention_output is not None:
                    cross_attention_output = jnp.concatenate(
                        [cross_attention_output, cond], axis=1)
                else:
                    cross_attention_output = cond
            elif op == "ignore":
                continue
            else:
                raise ValueError(f"unknown op ({op})")

        if self.cross_attention_pos_emb and cross_attention_output is not None:
            positions = jnp.arange(cross_attention_output.shape[1]).reshape(1, -1, 1)
            pos_emb = create_sin_embedding(positions, cross_attention_output.shape[-1])
            cross_attention_output = (cross_attention_output
                                      + self.cross_attention_pos_emb_scale
                                      * pos_emb.astype(cross_attention_output.dtype))
        return input, cross_attention_output


class ChromaStemConditioner(WaveformConditioner):
    """Chroma conditioner for melody (`conditioners.py:571-760`).

    Stem separation: like the reference (`conditioners.py:596-607`), the
    melodic stems (vocals+other) are isolated with HTDemucs before chroma
    extraction when a checkpoint is available (see
    `modules/demucs.get_stem_separator`: $DEMUCS_CHECKPOINT or
    `$AUDIOCRAFT_CACHE_DIR/htdemucs.th`); the separation runs host-driven
    at tokenize time so the traced conditioner program stays static.
    Without a checkpoint the chroma falls back to the full mix (documented
    divergence; pass pre-separated stems or chroma matrices for exact
    reference behavior in that case).
    """
    sample_rate: int = 32000
    n_chroma: int = 12
    radix2_exp: int = 12
    duration: float = 30.0
    match_len_on_eval: bool = True
    eval_wavs: tp.Optional[str] = None
    n_eval_wavs: int = 0
    cache_path: tp.Optional[str] = None

    def _chroma(self):
        from .chroma import ChromaExtractor
        return ChromaExtractor(sample_rate=self.sample_rate,
                               n_chroma=self.n_chroma,
                               radix2_exp=self.radix2_exp, argmax=True)

    def _separator(self):
        """(HTDemucs, params) when an htdemucs checkpoint is present."""
        from .demucs import get_stem_separator
        return get_stem_separator()

    def _separate(self, wav: "np.ndarray", sample_rate: int) -> "np.ndarray":
        """Isolate the melodic stems of [B, C, T] host-side; identity when
        no separator checkpoint is available."""
        sep = self._separator()
        if sep is None:
            return wav
        from .demucs import separate_melody
        model, params = sep
        return separate_melody(model, params, wav, sample_rate)

    @property
    def chroma_len(self) -> int:
        """Expected chroma frames for the training duration
        (`conditioners.py:660-666`), computed host-side: center-padded STFT
        gives 1 + T // hop frames."""
        T = int(self.sample_rate * self.duration)
        winhop = (2 ** self.radix2_exp) // 4
        return 1 + T // winhop

    @property
    def _winhop(self) -> int:
        return (2 ** self.radix2_exp) // 4

    def _embed_cache(self):
        """Lazy per-file chroma cache (`conditioners.py:646-658` wraps
        _get_wav_embedding with EmbeddingCache): the FULL file's chroma is
        computed once and keyed by sha1(path); batches extract a seek-based
        slice, so random training crops stay correct."""
        cache = getattr(self, "_cache", None)
        if cache is None:
            from ..utils.cache import EmbeddingCache

            def compute_full(path, xc, idx):
                from ..data.audio import audio_read
                from ..data.audio_utils import convert_audio
                wav, sr = audio_read(str(path))
                # stem-separate at the file's native layout (the separator
                # resamples to the demucs rate internally), then mix down
                wav = self._separate(np.asarray(wav)[None], sr)
                wav = convert_audio(np.asarray(wav), sr,
                                    self.sample_rate, 1)
                return np.asarray(self._chroma()(jnp.asarray(wav)))[0]

            def extract(full_embed, xc, idx):
                sr = xc.sample_rate[idx] or self.sample_rate
                seek = (xc.seek_time[idx] if idx < len(xc.seek_time)
                        and xc.seek_time[idx] else 0.0)
                start = int(seek * self.sample_rate) // self._winhop
                seg_samples = int(xc.wav.shape[-1] * self.sample_rate / sr)
                n_frames = 1 + seg_samples // self._winhop
                sl = full_embed[start:start + n_frames]
                if sl.shape[0] < n_frames:  # file shorter than the segment
                    sl = np.pad(sl, ((0, n_frames - sl.shape[0]), (0, 0)))
                return sl

            cache = EmbeddingCache(Path(self.cache_path) / "wav",
                                   compute_full, extract)
            object.__setattr__(self, "_cache", cache)
        return cache

    def tokenize(self, x: WavCondition) -> tp.Any:
        if (self.cache_path is None or x.wav.shape[-1] <= 1
                or not x.path or all(p is None for p in x.path)):
            if (self._separator() is not None and x.wav.shape[-1] > 1):
                return self._tokenize_separated(x)
            return x
        # per-sample: cache hit for path-bearing rows, direct chroma for the
        # rest (CFG null rows and in-memory wavs have no path)
        cache = self._embed_cache()
        seg_samples = int(x.wav.shape[-1] * self.sample_rate
                          / (x.sample_rate[0] or self.sample_rate))
        n_frames = 1 + seg_samples // self._winhop
        rows = []
        for idx, path in enumerate(x.path):
            if path is not None:
                seek = (x.seek_time[idx]
                        if idx < len(x.seek_time) and x.seek_time[idx]
                        else 0.0)
                row_x = WavCondition(
                    x.wav[idx:idx + 1], np.asarray(x.length)[idx:idx + 1],
                    [x.sample_rate[idx]], [path], [seek])
                rows.append(cache.get_embed_from_cache([path], row_x)[0])
            else:
                if int(np.asarray(x.length[idx])) <= 1:
                    rows.append(np.zeros((n_frames, self.n_chroma),
                                         np.float32))
                else:
                    sr_row = (x.sample_rate[idx] if idx < len(x.sample_rate)
                              and x.sample_rate[idx] else self.sample_rate)
                    wav = self._separate(np.asarray(x.wav[idx:idx + 1],
                                                    np.float32), sr_row)
                    if sr_row != self.sample_rate:
                        from ..data.audio_utils import convert_audio
                        wav = np.asarray(convert_audio(
                            wav, sr_row, self.sample_rate, 1))
                    c = np.asarray(self._chroma()(jnp.asarray(wav)))[0]
                    c = c[:n_frames]
                    if c.shape[0] < n_frames:
                        c = np.pad(c, ((0, n_frames - c.shape[0]), (0, 0)))
                    rows.append(c)
        return {"chroma": np.stack(rows).astype(np.float32),
                "length": np.asarray(x.length)}

    def _tokenize_separated(self, x: WavCondition) -> tp.Any:
        """Host-side stem separation + chroma; returns the same
        precomputed-chroma dict the embedding cache produces so the traced
        conditioner program stays identical either way. Rows sharing a
        sample rate separate in ONE batched demucs pass (per-row passes
        would rerun the whole network per row)."""
        from ..data.audio_utils import convert_audio
        sr0 = (x.sample_rate[0] if x.sample_rate and x.sample_rate[0]
               else self.sample_rate)
        seg_samples = int(x.wav.shape[-1] * self.sample_rate / sr0)
        n_frames = 1 + seg_samples // self._winhop
        B = x.wav.shape[0]

        def row_sr(idx):
            return (x.sample_rate[idx] if idx < len(x.sample_rate)
                    and x.sample_rate[idx] else self.sample_rate)

        live = [i for i in range(B) if int(np.asarray(x.length[i])) > 1]
        rows: tp.Dict[int, np.ndarray] = {}
        by_sr: tp.Dict[int, tp.List[int]] = {}
        for i in live:
            by_sr.setdefault(int(row_sr(i)), []).append(i)
        for sr, idxs in by_sr.items():
            wavs = np.asarray(x.wav, np.float32)[idxs]
            mel = self._separate(wavs, sr)              # [n, 1, T'] @ sr
            if sr != self.sample_rate:
                mel = np.asarray(convert_audio(mel, sr, self.sample_rate, 1))
            cs = np.asarray(self._chroma()(jnp.asarray(mel)))
            for j, i in enumerate(idxs):
                c = cs[j][:n_frames]
                if c.shape[0] < n_frames:
                    c = np.pad(c, ((0, n_frames - c.shape[0]), (0, 0)))
                rows[i] = c.astype(np.float32)
        out = np.zeros((B, n_frames, self.n_chroma), np.float32)
        for i, c in rows.items():
            out[i] = c
        return {"chroma": out, "length": np.asarray(x.length)}

    def _get_wav_embedding(self, x: WavCondition) -> jax.Array:
        """wav -> chroma [B, T_chroma, n_chroma] (`conditioners.py:700-740`)."""
        wav = jnp.asarray(x.wav, jnp.float32)
        if wav.shape[-1] == 1:
            # null condition: zero-length wav -> zero chroma frame
            return jnp.zeros((wav.shape[0], 1, self.n_chroma))
        chroma = self._chroma()(wav)
        if self.match_len_on_eval:
            T = chroma.shape[1]
            target = self.chroma_len
            if T > target:
                chroma = chroma[:, :target]
            elif T < target:
                n_repeat = int(math.ceil(target / T))
                chroma = jnp.tile(chroma, (1, n_repeat, 1))[:, :target]
        return chroma

    @nn.compact
    def __call__(self, x) -> ConditionType:
        if isinstance(x, dict) and "chroma" in x:
            # precomputed by the embedding cache at tokenize time
            chroma = jnp.asarray(x["chroma"])
            if self.match_len_on_eval and chroma.shape[1] != self.chroma_len:
                target = self.chroma_len
                if chroma.shape[1] > target:
                    chroma = chroma[:, :target]
                else:
                    n_repeat = int(math.ceil(target / chroma.shape[1]))
                    chroma = jnp.tile(chroma, (1, n_repeat, 1))[:, :target]
            lengths = jnp.asarray(x["length"]).reshape(-1)
        else:
            chroma = self._get_wav_embedding(x)
            lengths = jnp.asarray(x.length).reshape(-1)
        embeds = nn.Dense(self.output_dim, dtype=self.dtype,
                          param_dtype=self.param_dtype,
                          name="output_proj")(chroma.astype(self.dtype))
        # null conditions (length 0) get a zero mask
        valid = (lengths > 0)[:, None]
        mask = jnp.ones_like(embeds[..., 0]) * valid
        embeds = embeds * mask[..., None]
        return embeds, mask


class FeatureExtractor(WaveformConditioner):
    """Style feature extractor (`conditioners.py:762-870`): a random excerpt
    of the conditioning wav is encoded with a frozen EnCodec (its tokens
    embedded and summed) — the front end of the StyleConditioner.

    The codec model + variables are attached post-construction via
    `bind_feat_extractor` (they are frozen and live outside the param tree).
    """
    model_name: str = "encodec"
    sample_rate: int = 32000
    encodec_n_q: int = 4
    length: float = 3.0
    compute_mask: bool = True
    use_middle_of_segment: bool = False
    ds_rate_compression: int = 640
    num_codebooks_lm: int = 4
    feat_cardinality: int = 2048

    def _excerpt(self, wav: jax.Array, rng: np.random.RandomState
                 ) -> jax.Array:
        length_subwav = int(self.length * self.sample_rate)
        T = wav.shape[-1]
        if T <= length_subwav:
            pad = length_subwav - T
            return jnp.pad(wav, ((0, 0), (0, 0), (0, pad)))
        if self.use_middle_of_segment:
            start = (T - length_subwav) // 2
        else:
            start = rng.randint(0, T - length_subwav)
        return jax.lax.dynamic_slice_in_dim(wav, start, length_subwav, axis=-1)

    def tokenize(self, x: WavCondition) -> tp.Any:
        """Host-side: excerpt + frozen codec encode -> codes [B, n_q, Tf].

        `valid` is a per-sample [B, 1] float flag (null conditions — dropped
        or absent wavs — have length <= 1); the device side multiplies by it
        instead of branching so the program stays jittable.
        """
        wav = jnp.asarray(x.wav, jnp.float32)
        valid = (np.asarray(x.length).reshape(-1, 1) > 1).astype(np.float32)
        if self.model_name == "mert":
            return self._tokenize_mert(x, wav, valid)
        codec = getattr(self, "_codec", None)
        assert codec is not None, \
            "call bind_feat_extractor(conditioner, model, variables) first"
        model, variables = codec
        if wav.shape[-1] <= 1:  # all-null batch: skip the codec entirely
            return {"codes": np.zeros((wav.shape[0], self.encodec_n_q, 1),
                                      np.int32), "valid": valid}
        rng = np.random.RandomState()
        excerpt = self._excerpt(wav, rng)
        codes, _ = model.encode(variables, excerpt)
        n_q = getattr(self, "_encodec_n_q_used", self.encodec_n_q)
        return {"codes": np.asarray(codes[:, :n_q]), "valid": valid}

    def _tokenize_mert(self, x: WavCondition, wav: jax.Array,
                       valid: "np.ndarray") -> tp.Any:
        """MERT feature path (`conditioners.py:843-845`): excerpt ->
        24kHz mono -> native HuBERT/MERT encoder -> [B, T75, hidden]."""
        from .mert import get_mert
        mert = get_mert()
        assert mert is not None, (
            "MusicGen-Style with model_name='mert' needs a local MERT "
            "checkpoint: set $MERT_CHECKPOINT or place the HF snapshot "
            "under $AUDIOCRAFT_CACHE_DIR/mert (m-a-p/MERT-v1-95M)")
        model, variables = mert
        if wav.shape[-1] <= 1:  # all-null batch
            return {"mert": np.zeros((wav.shape[0], 1, model.hidden),
                                     np.float32), "valid": valid}
        rng = np.random.RandomState()
        excerpt = self._excerpt(wav, rng)
        from ..data.audio_utils import convert_audio
        sr = (x.sample_rate[0] if x.sample_rate and x.sample_rate[0]
              else self.sample_rate)
        wav24 = convert_audio(excerpt, sr, model.sample_rate, 1)[:, 0]
        from .mert import jitted_mert_apply
        embeds = jitted_mert_apply(model)(variables, wav24)
        return {"mert": np.asarray(embeds, np.float32), "valid": valid}

    def _feat_embeds(self, tokenized, dim: int) -> jax.Array:
        """Embed the tokenized features to `dim`: MERT hidden states go
        through a linear `embed` (`ref conditioners.py:818-819,849`); codec
        codes through per-stream embedding tables summed."""
        if "mert" in tokenized:
            feats = jnp.asarray(tokenized["mert"], self.dtype)
            return nn.Dense(dim, dtype=self.dtype,
                            param_dtype=self.param_dtype,
                            name="embed")(feats)
        codes = jnp.asarray(tokenized["codes"])  # [B, n_q, T]
        table = self.param("embed", nn.initializers.normal(1.0),
                           (self.encodec_n_q, self.feat_cardinality, dim),
                           self.param_dtype)
        # tolerate a post-hoc encodec_n_q reduction (set_params): use the
        # first codes.shape[1] stream tables
        gathered = jnp.take_along_axis(table[None, :codes.shape[1]],
                                       codes[..., None], axis=2)
        return jnp.sum(gathered, axis=1)  # [B, T, dim]

    @nn.compact
    def __call__(self, tokenized) -> ConditionType:
        embeds = self._feat_embeds(tokenized, self.dim)
        valid = jnp.asarray(tokenized["valid"])          # [B, 1]
        embeds = embeds * valid[..., None]
        mask = jnp.ones_like(embeds[..., 0]) * valid
        return embeds, mask


class StyleConditioner(FeatureExtractor):
    """Discrete-bottleneck style conditioner (`conditioners.py:872-1004`):
    feature extractor -> transformer -> RVQ bottleneck (eval_q streams at
    eval) -> downsample -> projection.

    The RVQ codebook state is a variable collection ('quantizer'), mutable at
    training time.
    """
    transformer_scale: str = "default"
    ds_factor: int = 15
    n_q_out: int = 6
    eval_q: int = 3
    q_dropout: bool = True
    bins: int = 1024
    varying_lengths: tp.Tuple[float, float] = (1.5, 4.5)
    batch_norm: bool = True
    rvq_threshold_ema_dead_code: float = 0.1

    _TR_ARGS: tp.ClassVar[dict] = {
        "xsmall": {"d_model": 256, "num_heads": 8, "num_layers": 4},
        "large": {"d_model": 1024, "num_heads": 16, "num_layers": 24},
        "default": {"d_model": 512, "num_heads": 8, "num_layers": 8},
        "none": {"d_model": 512},
    }

    @nn.compact
    def __call__(self, tokenized, training: bool = False) -> ConditionType:
        from ..quantization import ResidualVectorQuantizer
        from .transformer import StreamingTransformer
        tr_args = dict(self._TR_ARGS[self.transformer_scale])
        dim = tr_args["d_model"]

        z = self._feat_embeds(tokenized, dim)  # [B, T, dim]

        if self.transformer_scale != "none":
            z, _ = StreamingTransformer(
                dim_feedforward=int(4 * dim), activation="gelu",
                norm_first=True, causal=False, use_bias_ff=False,
                use_bias_attn=False, dtype=self.dtype,
                param_dtype=self.param_dtype, name="transformer",
                **tr_args)(z)
        if self.batch_norm:
            # affine-free BatchNorm1d (`ref conditioners.py:934`): batch
            # stats + running-average update at train, running stats at
            # eval (so ported checkpoints evaluate identically). Training
            # callers must mark 'batch_stats' mutable to persist updates.
            ra_mean = self.variable("batch_stats", "bn_mean",
                                    lambda: jnp.zeros((dim,), jnp.float32))
            ra_var = self.variable("batch_stats", "bn_var",
                                   lambda: jnp.ones((dim,), jnp.float32))
            if training:
                zf = z.astype(jnp.float32)
                mean = jnp.mean(zf, axis=(0, 1))
                var = jnp.var(zf, axis=(0, 1))
                if not self.is_initializing():
                    n = zf.shape[0] * zf.shape[1]
                    unbiased = var * n / max(n - 1, 1)
                    ra_mean.value = 0.9 * ra_mean.value + 0.1 * mean
                    ra_var.value = 0.9 * ra_var.value + 0.1 * unbiased
            else:
                mean, var = ra_mean.value, ra_var.value
            z = ((z - mean.astype(z.dtype))
                 / jnp.sqrt(var + 1e-5).astype(z.dtype))
        if self.n_q_out > 0:
            rvq = ResidualVectorQuantizer(
                dimension=dim, n_q=self.n_q_out, q_dropout=self.q_dropout,
                bins=self.bins,
                threshold_ema_dead_code=self.rvq_threshold_ema_dead_code,
                kmeans_init=False)
            qstate = self.variable(
                "quantizer", "style_rvq",
                lambda: rvq.init(jax.random.PRNGKey(0)))
            if training:
                qres, new_state = rvq.forward(qstate.value, z, frame_rate=1,
                                              training=True,
                                              rng=jax.random.PRNGKey(1))
                qstate.value = new_state
                z = qres.x
            else:
                rvq.set_num_codebooks(self.eval_q)
                codes_q = rvq.encode(qstate.value, z)
                z = rvq.decode(qstate.value, codes_q)
        # temporal downsampling by ds_factor (`conditioners.py:986-992`)
        z = z[:, ::self.ds_factor]
        embeds = self._output_proj(z)
        valid = jnp.asarray(tokenized["valid"])          # [B, 1]
        embeds = embeds * valid[..., None]
        mask = jnp.ones_like(embeds[..., 0]) * valid
        return embeds, mask


class JointEmbeddingConditioner(BaseConditioner):
    """Joint text/audio embedding conditioner (`conditioners.py:1006-1065`).

    Host side (`tokenize`) embeds either the text or the waveform into the
    joint space through `_get_embed` (subclass-provided, e.g. CLAP); device
    side optionally quantizes the embedding through an RVQ bottleneck and
    projects it to the model dim. Empty conditions produce a zero mask.
    """
    attribute: str = "description"
    quantize: bool = False
    n_q: int = 12
    bins: int = 1024

    def _get_embed(self, x: JointEmbedCondition
                   ) -> tp.Tuple[np.ndarray, np.ndarray]:
        """Return (embed [B, dim], valid [B, 1] float). Subclasses override."""
        raise NotImplementedError

    def tokenize(self, x: JointEmbedCondition) -> tp.Dict[str, np.ndarray]:
        embed, valid = self._get_embed(x)
        assert embed.ndim == 2, embed.shape
        return {"embed": np.asarray(embed, np.float32),
                "valid": np.asarray(valid, np.float32).reshape(-1, 1)}

    @nn.compact
    def __call__(self, tokenized) -> ConditionType:
        embed = jnp.asarray(tokenized["embed"])          # [B, dim]
        valid = jnp.asarray(tokenized["valid"])          # [B, 1]
        if self.quantize:
            from ..quantization import ResidualVectorQuantizer
            rvq = ResidualVectorQuantizer(dimension=embed.shape[-1],
                                          n_q=self.n_q, bins=self.bins,
                                          kmeans_init=False)
            qstate = self.variable("quantizer", "joint_rvq",
                                   lambda: rvq.init(jax.random.PRNGKey(0)))
            codes = rvq.encode(qstate.value, embed[:, None, :])
            embed = rvq.decode(qstate.value, codes)[:, 0]
        out = self._output_proj(embed[:, None, :])       # [B, 1, output_dim]
        out = out * valid[..., None]
        return out, jnp.ones_like(out[..., 0]) * valid


# CLAPEmbedder instances keyed by resolved checkpoint path: flax may clone
# module instances, and the towers are heavy (one jitted program per tower)
_CLAP_EMBEDDER_CACHE: tp.Dict[str, tp.Any] = {}


class CLAPEmbeddingConditioner(JointEmbeddingConditioner):
    """CLAP joint-embedding conditioner (`conditioners.py:1067-1293`) over
    the first-party JAX CLAP towers (`modules/clap.py`) — no `laion_clap`
    dependency. Host side (`_get_embed`): at train time embeds the AUDIO
    with probability `1 - text_p` (10 s windows with `audio_stride`-second
    stride, window embeddings averaged — ref `_compute_wav_embedding`) and
    the TEXT otherwise; at eval always the text. Null conditions (wav of
    length <= 1 / empty text) get a zero validity mask. The RVQ bottleneck
    and output projection are inherited from JointEmbeddingConditioner.

    Train mode and the text_p draw are host-side state — flax modules are
    frozen dataclasses — set via `set_joint_embed_train(cond, training)`.
    Construction never touches the checkpoint; the embedder is resolved on
    first `_get_embed` (checkpoint field -> env-resolved path, else
    `find_clap_checkpoint()` probing CLAP_CHECKPOINT/AUDIOCRAFT_CACHE_DIR).
    """
    checkpoint: str = ""
    model_arch: str = "HTSAT-base"
    enable_fusion: bool = False
    sample_rate: int = 48000
    max_audio_length: int = 10
    audio_stride: int = 1
    normalize: bool = True
    text_p: float = 0.0
    batch_size: tp.Optional[int] = None

    def setup(self):
        assert not self.enable_fusion, \
            "fusion CLAP variants are not supported"

    def _embedder(self):
        from pathlib import Path

        from ..environment import AudioCraftEnvironment
        from .clap import CLAPEmbedder, find_clap_checkpoint
        path = self.checkpoint
        if path:
            path = str(AudioCraftEnvironment.resolve_reference_path(path))
        resolved = Path(path) if path and Path(path).exists() \
            else find_clap_checkpoint()
        if resolved is None:
            raise RuntimeError(
                f"CLAPEmbeddingConditioner: no CLAP checkpoint at "
                f"{self.checkpoint!r} and none found via CLAP_CHECKPOINT / "
                "AUDIOCRAFT_CACHE_DIR (zero-egress image: drop a local "
                "laion-CLAP or HF ClapModel state dict).")
        key = str(resolved)
        if key not in _CLAP_EMBEDDER_CACHE:
            _CLAP_EMBEDDER_CACHE[key] = CLAPEmbedder.from_checkpoint(resolved)
        return _CLAP_EMBEDDER_CACHE[key]

    def _get_embed(self, x: JointEmbedCondition
                   ) -> tp.Tuple[np.ndarray, np.ndarray]:
        emb = self._embedder()
        training = bool(getattr(self, "_train_mode", False))
        rng = getattr(self, "_host_rng", None) or np.random
        use_text = (not training) or (float(rng.uniform()) < self.text_p)
        texts = [t if t is not None else "" for t in x.text]
        B = len(texts)
        valid = np.ones((B, 1), np.float32)
        if use_text:
            embed = np.asarray(emb.embed_text(texts), np.float32)
            for i, t in enumerate(texts):
                if t == "":
                    valid[i] = 0.0
        else:
            wav = np.asarray(x.wav, np.float32)  # [B, C, T]
            outs = []
            for i in range(B):
                sr = int(np.asarray(x.sample_rate).reshape(-1)[i])
                w = wav[i]
                if w.shape[-1] <= 1 or sr <= 0:  # nullified condition
                    valid[i] = 0.0
                    outs.append(None)
                    continue
                win = int(self.max_audio_length * sr)
                stride = max(int(self.audio_stride * sr), 1)
                T = w.shape[-1]
                if T <= win:
                    chunks = w[None]
                else:  # sliding 10 s windows, stride audio_stride seconds
                    chunks = np.stack([w[:, s:s + win]
                                       for s in range(0, T - win + 1, stride)])
                outs.append(np.asarray(emb.embed_audio(chunks, sr),
                                       np.float32).mean(axis=0))
            dim = next((o.shape[-1] for o in outs if o is not None),
                       self.dim or 512)
            embed = np.stack([o if o is not None
                              else np.zeros(dim, np.float32) for o in outs])
        if self.normalize:
            embed = embed / np.maximum(
                np.linalg.norm(embed, axis=-1, keepdims=True), 1e-8)
        return embed, valid


def set_joint_embed_train(conditioner: JointEmbeddingConditioner,
                          training: bool, seed: int = 0) -> None:
    """Set host-side train mode (and the text_p RNG) on a joint-embedding
    conditioner. flax modules are frozen dataclasses, so this mirrors
    `set_style_params` below and mutates via object.__setattr__."""
    object.__setattr__(conditioner, "_train_mode", bool(training))
    object.__setattr__(conditioner, "_host_rng", np.random.RandomState(seed))


def set_style_params(conditioner: "StyleConditioner", *, eval_q: int = 3,
                     excerpt_length: float = 3.0,
                     ds_factor: tp.Optional[int] = None,
                     encodec_n_q: tp.Optional[int] = None) -> None:
    """Post-hoc style-bottleneck knobs (`conditioners.py:957-970` set_params).

    Mutates the (frozen dataclass) module fields in place; param shapes are
    unaffected (eval_q <= n_q_out selects RVQ streams at decode, encodec_n_q
    may only shrink — the embed table is sliced). Callers must invalidate any
    jitted conditioner programs traced against the old values.
    """
    assert eval_q <= conditioner.n_q_out
    object.__setattr__(conditioner, "eval_q", eval_q)
    object.__setattr__(conditioner, "length", excerpt_length)
    if ds_factor is not None:
        object.__setattr__(conditioner, "ds_factor", ds_factor)
    if encodec_n_q is not None:
        # the embed table shape is fixed by init-time encodec_n_q; a runtime
        # reduction slices both the codes and the table
        assert encodec_n_q <= conditioner.encodec_n_q, \
            "encodec_n_q can only be reduced after init"
        object.__setattr__(conditioner, "_encodec_n_q_used", encodec_n_q)


def bind_feat_extractor(conditioner: FeatureExtractor, model, variables):
    """Attach the frozen codec used by FeatureExtractor/StyleConditioner."""
    object.__setattr__(conditioner, "_codec", (model, variables))
    return conditioner
