"""Model-agnostic NN building blocks (layer 2 of the stack)."""
# flake8: noqa
from .activations import get_activation_fn, glu
from .conv import (NormConv1d, NormConvTranspose1d, StreamableConv1d,
                   StreamableConvTranspose1d, pad1d, unpad1d,
                   pad_for_conv1d, get_extra_padding_for_conv1d)
from .lstm import StreamableLSTM, LSTMLayer
from .seanet import SEANetEncoder, SEANetDecoder, SEANetResnetBlock
from .demucs import (HTDemucs, apply_demucs, separate_melody,
                     get_stem_separator)
from .conv import NormConv2d
from .transformer import StreamingTransformer
from .mert import MERTModel, get_mert
