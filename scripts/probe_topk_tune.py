"""On-chip sweep of fused_grouped_topk tuning knobs at the elec full-sort
shape (VERDICT r4 ask #2: >=0.30 of HBM peak; r4 kernel measured 0.264).

Knobs: fold_arith (FMA mask vs compare+select in the fold kernel),
cand_mask ("mxu" one-hot byte contraction in-kernel vs "external" byte
gather outside), bt (user-tile rows). Timing uses bench.py's chained-carry
contract (serialized data dependence + host readback + 1-vs-n differencing)
— per-op timings below ~10 ms over the axon tunnel are untrustworthy
otherwise (docs/ROOFLINE.md).
"""
import os
import sys
import time
import itertools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from genmmrec_tpu.ops.fused_topk import fused_grouped_topk, pack_planar_mask

N_ITEMS, D, B, NCH, K = 63001, 64, 4096, 4, 50
HBM = 819e9


def main():
    rng = np.random.default_rng(0)
    total = B * NCH
    u_emb = jnp.asarray(rng.standard_normal((total, D), np.float32))
    i_emb = jnp.asarray(rng.standard_normal((N_ITEMS, D), np.float32))
    mask_idx = rng.integers(0, N_ITEMS, (total, 30))
    dense = np.zeros((total, N_ITEMS), bool)
    dense[np.arange(total)[:, None], mask_idx] = True
    pmask = jnp.asarray(pack_planar_mask(dense))
    ue = u_emb.astype(jnp.bfloat16)
    # unfused traffic model (score write+read + operands) — the bench metric
    bytes_moved = 2 * total * N_ITEMS * 2 + NCH * N_ITEMS * D * 2 + total * D * 2

    def run(**kw):
        @jax.jit
        def chained(acc):
            up = ue + (acc * jnp.asarray(1e-38, jnp.float32)).astype(
                jnp.bfloat16)

            def one(args):
                uc, mc = args
                v, _ = fused_grouped_topk(uc, i_emb, K, mc, **kw)
                return v

            uc = up.reshape(NCH, B, D)
            mc = pmask.reshape(NCH, B, -1)
            v = jax.lax.map(one, (uc, mc))
            v = jnp.maximum(v.astype(jnp.float32), -1e4)
            return acc + v.sum() * 1e-30

        def chain(n):
            acc = jnp.float32(0.0)
            t0 = time.time()
            for _ in range(n):
                acc = chained(acc)
            np.asarray(acc)
            return time.time() - t0

        chain(1)
        n = 6
        t1 = min(chain(1) for _ in range(2))
        tn = min(chain(n) for _ in range(2))
        return max(tn - t1, 1e-9) / (n - 1)

    results = {}
    for arith, cm, bt in itertools.product(
        (False, True), ("mxu", "external"), (256, 512)
    ):
        key = f"arith={int(arith)} cand={cm:8s} bt={bt}"
        try:
            dt = run(fold_arith=arith, cand_mask=cm, bt=bt)
        except Exception as e:
            print(f"{key}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            continue
        frac = bytes_moved / dt / HBM
        results[key] = dt
        print(f"{key}: {dt*1e3:7.2f} ms/16k  frac_hbm={frac:.3f}", flush=True)

    if results:
        best = min(results, key=results.get)
        print(f"\nBEST: {best}  {results[best]*1e3:.2f} ms "
              f"(frac={bytes_moved/results[best]/HBM:.3f})")


if __name__ == "__main__":
    main()
