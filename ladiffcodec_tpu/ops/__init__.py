from .pad import (
    pad1d,
    unpad1d,
    pad_for_conv1d,
    get_extra_padding_for_conv1d,
    sconv1d_paddings,
    sconvtr1d_unpaddings,
)
from .conv import (
    SConv1d,
    SConvTranspose1d,
    NormConv1d,
    NormConvTranspose1d,
    NormConv2d,
    NormConvTranspose2d,
)
from .lstm import SLSTM, LSTMLayer
