from .seanet import SEANetEncoder, SEANetDecoder, SEANetResnetBlock
