from .core import (
    RVQState,
    RVQOutput,
    init_rvq_state,
    kmeans,
    kmeans_init_state,
    quantize_stage,
    dequantize_stage,
    rvq_forward,
    rvq_encode,
    rvq_decode,
)
from .rvq import ResidualVectorQuantizer, QuantizedResult
