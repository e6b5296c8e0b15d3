"""genmmrec_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for generative
multimodal top-K recommendation.

Capability-equivalent rebuild of GenMMRec (reference:
/root/reference/GenMMRec) designed TPU-first:

- functional, key-threaded PRNG everywhere
- device-resident data pipeline with vectorized negative sampling
- sparse graph propagation as segment-sum / Pallas kernels
- diffusion samplers as ``lax.scan`` over precomputed schedules
- evaluation (full-catalog scoring, masking, top-K, metrics) entirely on device
- scaling via ``jax.sharding.Mesh`` + ``pjit`` collectives
"""

__version__ = "0.1.0"
