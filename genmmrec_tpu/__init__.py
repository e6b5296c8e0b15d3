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


def _enable_compilation_cache():
    """Persistent XLA compilation cache.

    End-to-end wall-clock is compile-dominated for short runs (epoch 0 of a
    jitted-scan trainer pays the full trace+compile on the single host core;
    observed ~490s for BPR/baby vs 0.1s steady-state). Identical HLO across
    processes — repeat runs, seed sweeps (the PRNG key is an argument, not a
    constant), and zoo re-runs — hits this cache instead of recompiling.
    Opt out with GENMMREC_NO_CACHE=1.
    """
    import os

    if os.environ.get("GENMMREC_NO_CACHE"):
        return
    if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
        # XLA:CPU AOT cache entries bake host machine features; this VM's
        # CPU microarch changes across resets (observed +prefer-no-scatter
        # mismatch warnings with SIGILL risk). CPU runs (the test lane) are
        # fast to compile anyway — skip the persistent cache there.
        return
    try:
        import jax

        cache_dir = os.environ.get(
            "GENMMREC_CACHE_DIR",
            os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # cache is best-effort; never block startup
        pass


_enable_compilation_cache()
