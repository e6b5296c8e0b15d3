#!/usr/bin/env python
"""What does the axon TPU device actually expose for memory accounting?

The elec-scale runs record peak_hbm_gb=None because `dev.memory_stats()`
either raises or carries no peak/bytes keys over the tunnel. This prints the
raw dict plus a compiled-program `memory_analysis()` so docs/ELEC_SCALE.md
can carry whichever number the platform supports.
"""
import jax
import jax.numpy as jnp


def main():
    dev = jax.devices()[0]
    print("device:", dev, "platform:", dev.platform)
    x = jnp.ones((4096, 4096), jnp.float32)
    y = (x @ x).block_until_ready()
    try:
        stats = dev.memory_stats()
        print("memory_stats keys:", sorted((stats or {}).keys()))
        for k, v in sorted((stats or {}).items()):
            print(f"  {k} = {v}")
    except Exception as e:
        print("memory_stats raised:", repr(e))

    f = jax.jit(lambda a: (a @ a).sum())
    comp = f.lower(x).compile()
    try:
        ma = comp.memory_analysis()
        print("memory_analysis:", ma)
        for attr in ("temp_size_in_bytes", "argument_size_in_bytes",
                     "output_size_in_bytes", "generated_code_size_in_bytes"):
            print(f"  {attr} = {getattr(ma, attr, 'n/a')}")
    except Exception as e:
        print("memory_analysis raised:", repr(e))
    del y


if __name__ == "__main__":
    main()
