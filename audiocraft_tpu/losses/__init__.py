"""Losses (layer 5)."""
# flake8: noqa
from .balancer import Balancer, BalancerState
from .sisnr import SISNR
from .specloss import (MelSpectrogramL1Loss, MelSpectrogramWrapper,
                       MultiScaleMelSpectrogramLoss)
from .stftloss import (MRSTFTLoss, STFTLoss, STFTLosses,
                       log_stft_magnitude, spectral_convergence)
from .loudnessloss import FLoudnessRatio, TFLoudnessRatio, TLoudnessRatio
from .wmloss import WMDetectionLoss, WMMbLoss
