"""Dissect the ~446 s epoch-0 wall of a baby BPR run (our_runs/
BPR-baby-warm) and test whether the persistent compilation cache ever
covers the train-epoch program on the axon backend.

Phases printed separately:
  build_s    : dataset + trainer construction (host)
  trace_s    : jax trace+lower of train_epoch_impl (host)
  compile_s  : XLA compile (remote on axon)
  run_s      : one epoch execution

Run twice (fresh processes) — if compile_s stays large on the second run,
the persistent cache is not covering this executable and warm-run wall
claims must be fixed another way.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from genmmrec_tpu.quick_start import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from genmmrec_tpu.config import Config
from genmmrec_tpu.data.arrays import build_train_data
from genmmrec_tpu.data.dataset import RecDataset
from genmmrec_tpu.engine.trainer import get_trainer
from genmmrec_tpu.models import get_model
from genmmrec_tpu.utils.misc import init_seed


def main():
    model_name = sys.argv[1] if len(sys.argv) > 1 else "BPR"
    t0 = time.time()
    config = Config(model_name, "baby", {"save_recommended_topk": False})
    init_seed(999)
    ds = RecDataset(config)
    train, _, _ = ds.split()
    td = build_train_data(train)
    model = get_model(model_name)(config, td)
    trainer = get_trainer(model_name)(config, model)
    optimizer, train_epoch = trainer._build_train_step(td)
    params = model.init_params(jax.random.PRNGKey(0))
    trainer._state = model.init_state(jax.random.PRNGKey(1))
    opt_state = optimizer.init(params)
    print(f"build_s   : {time.time()-t0:8.1f}", flush=True)

    key = jax.random.PRNGKey(42)
    t0 = time.time()
    out = train_epoch(params, opt_state, trainer._state, key)
    jax.block_until_ready(out)
    print(f"first_epoch_s (trace+compile+run): {time.time()-t0:8.1f}",
          flush=True)

    params, opt_state, state, totals = out
    t0 = time.time()
    out = train_epoch(params, opt_state, state, jax.random.PRNGKey(43))
    jax.block_until_ready(out)
    print(f"steady_epoch_s: {time.time()-t0:8.2f}", flush=True)

    cache_dir = os.path.join(
        os.path.expanduser("~"), ".cache", "genmmrec_jax")
    if os.path.isdir(cache_dir):
        ents = os.listdir(cache_dir)
        big = sorted(
            ((os.path.getsize(os.path.join(cache_dir, e)), e) for e in ents),
            reverse=True,
        )[:5]
        print(f"cache entries: {len(ents)}")
        for sz, e in big:
            print(f"  {sz/1e6:8.2f} MB  {e[:80]}")


if __name__ == "__main__":
    main()
