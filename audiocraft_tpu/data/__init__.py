"""Host-side audio data plane (layer 1)."""
# flake8: noqa
from . import audio, audio_utils
