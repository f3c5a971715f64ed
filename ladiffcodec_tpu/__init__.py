"""ladiffcodec_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of LaDiffCodec.

A 16 kHz neural speech codec in three trainable pieces (reference:
haiciyang/LaDiffCodec, `srcs/model.py`):

1. a discrete EnCodec-style codec (SEANet conv/LSTM encoder-decoder +
   residual vector quantization),
2. a continuous SEANet autoencoder, and
3. a 1-D latent-diffusion "de-quantizer" that maps the coded latent to a
   sample of the continuous latent before waveform decoding.

Everything here is idiomatic JAX: flax.linen modules, pure functions with
explicit PRNG keys, `lax.scan` for every sequential loop the reference runs
in Python (RVQ stages, LSTM steps, denoise steps), `shard_map` data
parallelism over a `jax.sharding.Mesh`, and orbax checkpoints.  Internal
activation layout is NLC (batch, time, channels) — the TPU-friendly layout —
while the reference uses torch's NCL.
"""

__version__ = "0.1.0"
