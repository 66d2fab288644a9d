"""JASCO conditioners: melody salience, chord embeddings, drum latents.

Parity: `audiocraft/modules/jasco_conditioners.py:15-300`.

`DrumsConditioner` mirrors the reference pipeline
(`jasco_conditioners.py:99-137`): drum-stem separation with the native
HTDemucs (when `$DEMUCS_CHECKPOINT` / `$AUDIOCRAFT_CACHE_DIR/htdemucs.th`
is present), continuous EnCodec encoding, quantization to the coarsest
codebook, decode back to latents, temporal blurring. Without a demucs
checkpoint the provided waveform is consumed directly as the drum stem
(pass pre-separated stems, e.g. the dataset's `sep_drums_*` files); the
codec is attached with `bind_drums_codec`, and pre-computed latents are
still accepted.
"""
import typing as tp

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .conditioners import (BaseConditioner, ConditionType, SymbolicCondition,
                           WavCondition, WaveformConditioner)


class MelodyConditioner(BaseConditioner):
    """Pre-computed salience matrix -> projected embedding
    (`jasco_conditioners.py:15-34`)."""
    card: int = 53

    def tokenize(self, x: SymbolicCondition) -> SymbolicCondition:
        return x

    @nn.compact
    def __call__(self, x: SymbolicCondition) -> ConditionType:
        melody = jnp.asarray(x.melody)  # [B, card, T]
        embeds = nn.Dense(self.output_dim, dtype=self.dtype,
                          param_dtype=self.param_dtype,
                          name="output_proj")(jnp.swapaxes(melody, 1, 2))
        mask = jnp.ones_like(embeds[..., 0])
        return embeds, mask


class ChordsEmbConditioner(BaseConditioner):
    """Chord-index embedding (`jasco_conditioners.py:36-57`)."""
    card: int = 194
    out_dim: int = 0

    def tokenize(self, x: SymbolicCondition) -> SymbolicCondition:
        return x

    @nn.compact
    def __call__(self, x: SymbolicCondition) -> ConditionType:
        vocab_size = self.card + 1  # +1 null chord for dropout
        chords = jnp.asarray(x.frame_chords)
        embeds = nn.Embed(vocab_size, self.out_dim or self.output_dim,
                          dtype=self.dtype, param_dtype=self.param_dtype,
                          name="emb")(chords)
        mask = jnp.ones_like(embeds[..., 0])
        return embeds, mask


class DrumsConditioner(WaveformConditioner):
    """Drum-stem EnCodec latents with temporal blurring
    (`jasco_conditioners.py:59-215`)."""
    sample_rate: int = 32000
    blurring_factor: int = 3
    compression_model_latent_dim: int = 128
    compression_model_framerate: float = 50
    segment_duration: float = 10.0

    def _temporal_blur(self, z: jax.Array) -> jax.Array:
        """Average over `blurring_factor` frames and repeat
        (`jasco_conditioners.py:116-128`)."""
        B, T, C = z.shape
        bf = self.blurring_factor
        if T % bf != 0:
            pad_val = bf - T % bf
            z = jnp.concatenate([z, z[:, T - pad_val:][:, ::-1]], axis=1)
        zb = z.reshape(B, -1, bf, C).mean(axis=2)
        zb = jnp.repeat(zb, bf, axis=1)
        return zb[:, :T]

    @property
    def seq_len(self) -> int:
        return int(self.segment_duration * self.compression_model_framerate)

    def _drums_stem(self, wav: np.ndarray, sample_rate: int) -> np.ndarray:
        """Isolate the drum stem host-side (`jasco_conditioners.py:99-109`);
        identity when no htdemucs checkpoint is available."""
        from .demucs import apply_demucs, get_stem_separator
        sep = get_stem_separator()
        if sep is None:
            return wav
        from ..data.audio_utils import convert_audio
        model, params = sep
        x = np.asarray(convert_audio(wav, sample_rate, model.samplerate,
                                     model.audio_channels))
        stems = apply_demucs(model, params, x)
        drum = stems[:, model.sources.index("drums")]
        return np.asarray(convert_audio(drum, model.samplerate,
                                        sample_rate, 1))

    def tokenize(self, x):
        """WavCondition -> precomputed coarse drum latents (host-side
        pipeline of `jasco_conditioners.py:124-137`) when a codec has been
        bound with `bind_drums_codec`; otherwise passed through."""
        if not isinstance(x, WavCondition):
            return x
        codec = getattr(self, "_codec", None)
        if codec is None:
            return x
        model, variables = codec
        wav = np.asarray(x.wav, np.float32)
        B = wav.shape[0]
        valid = (np.asarray(x.length).reshape(-1, 1) > 1).astype(np.float32)
        if wav.shape[-1] <= 1:  # all-null batch
            return {"latents": np.zeros(
                (B, self.seq_len, self.compression_model_latent_dim),
                np.float32), "valid": valid}
        srs = [s for s in (x.sample_rate or []) if s]
        assert all(s == srs[0] for s in srs), (
            "All sample rates in a drums batch must be equal "
            f"(`ref jasco_conditioners.py:195`), got {srs}")
        sr = srs[0] if srs else self.sample_rate
        drums = self._drums_stem(wav, sr)
        if sr != self.sample_rate or drums.shape[1] != 1:
            # no-separator passthrough may still be multichannel
            from ..data.audio_utils import convert_audio
            drums = np.asarray(convert_audio(drums, sr, self.sample_rate, 1))
        codes, _ = model.encode(variables, jnp.asarray(drums))
        coarse = codes[:, :1]                       # coarsest codebook only
        latents = model.decode_latent(variables, coarse)  # [B, T, D]
        return {"latents": np.asarray(latents, np.float32), "valid": valid}

    @nn.compact
    def __call__(self, x) -> ConditionType:
        """x: dict from tokenize ({"latents", "valid"}), pre-computed
        latents [B, T, D], or a WavCondition (requires a bound codec)."""
        valid = None
        if isinstance(x, dict):
            valid = jnp.asarray(x["valid"])
            x = x["latents"]
        if isinstance(x, WavCondition):
            raise RuntimeError(
                "DrumsConditioner got a raw WavCondition: attach the codec "
                "with bind_drums_codec(conditioner, model, variables) so "
                "tokenize() can precompute drum latents, or pass latents "
                "directly.")
        latents = jnp.asarray(x)  # [B, T, D]
        z = self._temporal_blur(latents)
        embeds = nn.Dense(self.output_dim, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="output_proj")(z)
        mask = jnp.ones_like(embeds[..., 0])
        if valid is not None:  # null rows (dropout) get zero embeds + mask
            embeds = embeds * valid[..., None]
            mask = mask * valid
        return embeds, mask


def bind_drums_codec(conditioner: DrumsConditioner, model, variables):
    """Attach the frozen compression model the drum-latent pipeline encodes
    with (reference: `jasco.py` assigns `conditioner.compression_model`)."""
    object.__setattr__(conditioner, "_codec", (model, variables))
    return conditioner


class JascoConditioningProvider:
    """Provider variant that pads temporal conditions to fixed lengths
    (`jasco_conditioners.py:216-300`)."""

    def __init__(self, conditioners: tp.Dict[str, BaseConditioner],
                 chords_card: int = 194,
                 sequence_length: int = 500,
                 melody_dim: int = 53):
        self.conditioners = conditioners
        self.null_chord = chords_card
        self.sequence_length = sequence_length
        self.melody_dim = melody_dim

    @property
    def text_conditions(self):
        from .conditioners import TextConditioner
        return [k for k, v in self.conditioners.items()
                if isinstance(v, TextConditioner)]

    def tokenize(self, inputs) -> tp.Dict[str, tp.Any]:
        from collections import defaultdict
        output = {}
        text = defaultdict(list)
        for sample in inputs:
            for condition in self.text_conditions:
                text[condition].append(sample.text.get(condition))
        for attribute, batch in text.items():
            output[attribute] = self.conditioners[attribute].tokenize(batch)

        # wav conditions (drum stems): batch the rows and let the
        # conditioner's tokenize run its host-side pipeline
        wavs = defaultdict(list)
        for sample in inputs:
            for attribute, wav_cond in sample.wav.items():
                if attribute in self.conditioners:
                    wavs[attribute].append(wav_cond)
        for attribute, conds in wavs.items():
            T = max(int(c.wav.shape[-1]) for c in conds)
            CH = max(int(c.wav.shape[-2]) for c in conds)
            rows, lengths, srs, paths = [], [], [], []
            for c in conds:
                w = np.asarray(c.wav, np.float32)
                if w.shape[-2] != CH:  # mono rows upmix to the batch layout
                    from ..data.audio_utils import convert_audio_channels
                    w = np.asarray(convert_audio_channels(w, CH))
                if w.shape[-1] < T:
                    w = np.pad(w, ((0, 0),) * (w.ndim - 1)
                               + ((0, T - w.shape[-1]),))
                rows.append(w)
                lengths.append(int(np.asarray(c.length).reshape(-1)[0]))
                srs.append(c.sample_rate[0] if c.sample_rate else None)
                paths.append(c.path[0] if c.path else None)
            batched = WavCondition(np.concatenate(rows, axis=0),
                                   np.asarray(lengths), sample_rate=srs,
                                   path=paths)
            tok = self.conditioners[attribute].tokenize(batched)
            if isinstance(tok, dict) and "latents" in tok:
                lat = tok["latents"][:, :self.sequence_length]
                if lat.shape[1] < self.sequence_length:
                    lat = np.pad(lat, ((0, 0),
                                       (0, self.sequence_length - lat.shape[1]),
                                       (0, 0)))
                tok = dict(tok, latents=lat)
            output[attribute] = tok

        # symbolic conditions: pad chords to sequence_length with null chord,
        # melody salience to [B, melody_dim, sequence_length] with zeros
        for sample in inputs:
            for attribute, sym in sample.symbolic.items():
                if attribute not in self.conditioners:
                    continue
                output.setdefault(attribute, []).append(sym)
        for attribute in list(output.keys()):
            if isinstance(output[attribute], list):
                syms = output[attribute]
                if syms and syms[0].frame_chords is not None:
                    chords = [np.asarray(s.frame_chords).reshape(-1) for s in syms]
                    padded = np.full((len(chords), self.sequence_length),
                                     self.null_chord, np.int32)
                    for i, c in enumerate(chords):
                        L = min(len(c), self.sequence_length)
                        padded[i, :L] = c[:L]
                    output[attribute] = SymbolicCondition(frame_chords=padded)
                else:
                    mats = [np.asarray(s.melody) for s in syms]
                    padded = np.zeros((len(mats), self.melody_dim,
                                       self.sequence_length), np.float32)
                    for i, m in enumerate(mats):
                        L = min(m.shape[-1], self.sequence_length)
                        padded[i, :, :L] = m[:, :L]
                    output[attribute] = SymbolicCondition(melody=padded)
        return output

    def __call__(self, model, params, tokenized: tp.Dict[str, tp.Any]
                 ) -> tp.Dict[str, ConditionType]:
        raise NotImplementedError("applied inside FlowMatchingModel")
