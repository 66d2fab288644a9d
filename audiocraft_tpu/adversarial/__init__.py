"""Adversarial networks and losses (layer 5)."""
# flake8: noqa
from .discriminators.base import MultiDiscriminator
from .discriminators.mpd import MultiPeriodDiscriminator
from .discriminators.msd import MultiScaleDiscriminator
from .discriminators.msstftd import MultiScaleSTFTDiscriminator
from .losses import (ADVERSARIAL_LOSSES, AdversarialLoss, AdversaryState,
                     FeatureMatchingLoss, get_adv_criterion,
                     get_fake_criterion, get_real_criterion)
