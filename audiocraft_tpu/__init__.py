"""AudioCraft-TPU: a TPU-native generative-audio framework (JAX/XLA/Pallas).

Provides training + inference for:
  * EnCodec        -- streaming neural audio codec (SEANet + RVQ)
  * MusicGen       -- text/melody -> music autoregressive token LM
  * AudioGen       -- text -> sound AR LM
  * MAGNeT         -- non-autoregressive masked token LM
  * MultiBandDiffusion -- diffusion decoder for EnCodec tokens
  * JASCO          -- flow-matching music generation
  * AudioSeal      -- watermark generator / detector

Feature parity target: facebookresearch/audiocraft v1.4.0a2
(`/root/reference/audiocraft/__init__.py:6-28`), re-designed TPU-first:
channels-last layouts, functional KV caches, `lax.scan` decode loops,
GSPMD sharding instead of FSDP wrappers.
"""

# flake8: noqa
from . import data, modules, models

__version__ = "0.1.0"
