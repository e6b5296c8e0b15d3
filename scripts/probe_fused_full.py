"""Validate + time fused_grouped_topk vs the r4 unfused grouped path at the
elec full-sort shape (VERDICT r4 ask #2)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from genmmrec_tpu.ops.fused_topk import (
    fused_grouped_topk, pack_planar_mask, n_full_for,
)
from genmmrec_tpu.ops.topk import grouped_topk

N_ITEMS, D, B, NCH, K = 63001, 64, 4096, 4, 50


def main():
    rng = np.random.default_rng(0)
    total = B * NCH
    u = jnp.asarray(rng.standard_normal((total, D), np.float32))
    it = jnp.asarray(rng.standard_normal((N_ITEMS, D), np.float32))
    n128 = -(-N_ITEMS // 128) * 128
    mask_idx = rng.integers(0, N_ITEMS, (total, 30))
    dense = np.zeros((total, n128), bool)
    dense[:, N_ITEMS:] = True
    dense[np.arange(total)[:, None], mask_idx] = True
    pm_std = jnp.asarray(np.packbits(dense, axis=1, bitorder="little"))
    nf = n_full_for(N_ITEMS)
    dense_f = np.concatenate(
        [dense, np.ones((total, nf - n128), bool)], axis=1)
    pm_pl = jnp.asarray(pack_planar_mask(dense_f[:, :N_ITEMS]))
    it_pad = jnp.pad(it, ((0, n128 - N_ITEMS), (0, 0)))

    # ---- correctness on one chunk
    @jax.jit
    def ours(uc, mc):
        return fused_grouped_topk(uc, it, K, mc)

    @jax.jit
    def base(uc, mc):
        s = uc.astype(jnp.bfloat16) @ it_pad.T.astype(jnp.bfloat16)
        return grouped_topk(s, K, packed_mask=mc)

    v1, i1 = jax.tree.map(np.asarray, ours(u[:B], pm_pl[:B]))
    v2, i2 = jax.tree.map(np.asarray, base(u[:B], pm_std[:B]))
    vm = np.abs(v1.astype(np.float32) - v2.astype(np.float32)).max()
    im = (i1 != i2).mean()
    # ties at equal bf16 values may reorder — compare value sets
    print(f"value max |diff|: {vm}   index mismatch frac: {im:.5f}")
    bad = np.abs(v1.astype(np.float32) - v2.astype(np.float32)) > 0
    print("rows with any value diff:", bad.any(axis=1).sum(), "/", B)

    # ---- timing, chained-carry contract (see bench.py fullsort_roofline)
    def bench(fn, masks):
        @jax.jit
        def chained(acc):
            up = u + (acc * jnp.asarray(1e-38, jnp.float32))

            def one(args):
                uc, mc = args
                v, _ = fn(uc, mc)
                return v
            uc = up.reshape(NCH, B, D)
            mc = masks.reshape(NCH, B, -1)
            v = jax.lax.map(one, (uc, mc))
            return acc + v.astype(jnp.float32).sum() * 1e-30

        def chain(n):
            acc = jnp.float32(0.0)
            t0 = time.time()
            for _ in range(n):
                acc = chained(acc)
            np.asarray(acc)
            return time.time() - t0

        chain(1)
        t1 = min(chain(1) for _ in range(2))
        tn = min(chain(6) for _ in range(2))
        return max(tn - t1, 1e-9) / 5

    dt_f = bench(lambda uc, mc: fused_grouped_topk(uc, it, K, mc), pm_pl)
    dt_b = bench(
        lambda uc, mc: grouped_topk(
            uc.astype(jnp.bfloat16) @ it_pad.T.astype(jnp.bfloat16),
            K, packed_mask=mc), pm_std)
    by = 2 * total * N_ITEMS * 2 + NCH * N_ITEMS * D * 2 + total * D * 2
    print(f"fused : {dt_f*1e3:8.2f} ms/16k users  "
          f"frac_hbm {by/dt_f/819e9:.4f}")
    print(f"r4    : {dt_b*1e3:8.2f} ms/16k users  "
          f"frac_hbm {by/dt_b/819e9:.4f}")
    print(f"speedup: {dt_b/dt_f:.2f}x")


if __name__ == "__main__":
    main()
