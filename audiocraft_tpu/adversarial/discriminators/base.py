"""Multi-discriminator interface (`audiocraft/adversarial/discriminators/base.py:19-38`).

Discriminators are linen modules returning (logits list, feature-maps list).
"""
import typing as tp

import flax.linen as nn
import jax

MultiDiscriminatorOutputType = tp.Tuple[tp.List[jax.Array],
                                        tp.List[tp.List[jax.Array]]]


class MultiDiscriminator(nn.Module):
    """Base for discriminators composed of sub-discriminators."""

    @property
    def num_discriminators(self) -> int:
        raise NotImplementedError()
