from .binary import (
    BitPacker,
    BitUnpacker,
    write_ecdc_header,
    read_ecdc_header,
    pack_codes,
    unpack_codes,
)
from .ac import ArithmeticCoder, ArithmeticDecoder, build_stable_quantized_cdf
from .encodec_model import EncodecModel, linear_overlap_add
from .compress import MODELS, compress, decompress, compress_to_file, decompress_from_file
