"""Stage-level timing of fused_grouped_topk at the elec full-sort shape.

Chained-carry contract (like bench.py's fullsort roofline): each timed
iteration perturbs the inputs by the previous iteration's scalar result so
the axon tunnel cannot cache identical executions.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from genmmrec_tpu.ops.fused_topk import (
    _fold_kernel, _cand_kernel, pack_planar_mask, n_full_for,
    TILE_N, _BT,
)
from genmmrec_tpu.ops.topk import _GROUP, grouped_topk

N_ITEMS, D, B, NCH, K = 63001, 64, 4096, 4, 50


def timer(step, total_users):
    """step: acc -> acc, jitted. Returns s per 16k users."""
    def chain(n):
        acc = jnp.float32(0.0)
        t0 = time.time()
        for _ in range(n):
            acc = step(acc)
        np.asarray(acc)
        return time.time() - t0

    chain(1)
    t1 = min(chain(1) for _ in range(2))
    tn = min(chain(6) for _ in range(2))
    return max(tn - t1, 1e-9) / 5 * (16384 / total_users)


def main():
    rng = np.random.default_rng(0)
    total = B * NCH
    u = jnp.asarray(rng.standard_normal((total, D), np.float32))
    it = jnp.asarray(rng.standard_normal((N_ITEMS, D), np.float32))
    mask_idx = rng.integers(0, N_ITEMS, (total, 30))
    dense = np.zeros((total, N_ITEMS), bool)
    dense[np.arange(total)[:, None], mask_idx] = True
    pm_pl = jnp.asarray(pack_planar_mask(dense))

    nf = n_full_for(N_ITEMS)
    nt = nf // TILE_N
    ng = nf // _GROUP
    bt = _BT
    kp = max(8, -(-K // 8) * 8)
    table = jnp.pad(it, ((0, nf - N_ITEMS), (0, 0))).astype(jnp.bfloat16).T
    ue = u.astype(jnp.bfloat16)
    vmem = dict(compiler_params=pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024))

    def fold(uc, mc):
        return pl.pallas_call(
            partial(_fold_kernel, bt=bt, tn=TILE_N, nt=nt, group=_GROUP),
            grid=(B // bt,),
            in_specs=[
                pl.BlockSpec((bt, D), lambda i: (i, 0)),
                pl.BlockSpec((D, nf), lambda i: (0, 0)),
                pl.BlockSpec((bt, nf // 8), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec((bt, ng), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((B, ng), jnp.bfloat16),
            **vmem,
        )(uc, table, mc)

    def cand(gidx_p, uc, mc):
        return pl.pallas_call(
            partial(_cand_kernel, bt=bt, tn=TILE_N, nt=nt, group=_GROUP,
                    kp=kp),
            grid=(B // bt,),
            in_specs=[
                pl.BlockSpec((bt, kp), lambda i: (i, 0)),
                pl.BlockSpec((bt, D), lambda i: (i, 0)),
                pl.BlockSpec((D, nf), lambda i: (0, 0)),
                pl.BlockSpec((bt, nf // 8), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec((bt, kp * _GROUP), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((B, kp * _GROUP), jnp.bfloat16),
            **vmem,
        )(gidx_p, uc, table, mc)

    eps = jnp.asarray(1e-38, jnp.float32)

    @jax.jit
    def s_fold(acc):
        up = (ue.astype(jnp.float32) + acc * eps).astype(jnp.bfloat16)

        def one(args):
            uc, mc = args
            g = fold(uc, mc).astype(jnp.float32)
            return jnp.maximum(g, -1e4).sum()
        v = jax.lax.map(one, (up.reshape(NCH, B, D),
                              pm_pl.reshape(NCH, B, -1)))
        return acc + v.sum() * 1e-30

    @jax.jit
    def s_fold_topk(acc):
        up = (ue.astype(jnp.float32) + acc * eps).astype(jnp.bfloat16)

        def one(args):
            uc, mc = args
            g = fold(uc, mc)
            _, gidx = jax.lax.top_k(g, K)
            return gidx.sum()
        v = jax.lax.map(one, (up.reshape(NCH, B, D),
                              pm_pl.reshape(NCH, B, -1)))
        return acc + v.sum().astype(jnp.float32) * 1e-30

    @jax.jit
    def s_thru_cand(acc):
        up = (ue.astype(jnp.float32) + acc * eps).astype(jnp.bfloat16)

        def one(args):
            uc, mc = args
            g = fold(uc, mc)
            _, gidx = jax.lax.top_k(g, K)
            gp = jnp.pad(gidx, ((0, 0), (0, kp - K)), constant_values=ng)
            c = cand(gp, uc, mc)
            return jnp.maximum(c.astype(jnp.float32), -1e4).sum()
        v = jax.lax.map(one, (up.reshape(NCH, B, D),
                              pm_pl.reshape(NCH, B, -1)))
        return acc + v.sum() * 1e-30

    @jax.jit
    def s_full(acc):
        up = (ue.astype(jnp.float32) + acc * eps).astype(jnp.bfloat16)

        def one(args):
            uc, mc = args
            g = fold(uc, mc)
            _, gidx = jax.lax.top_k(g, K)
            gp = jnp.pad(gidx, ((0, 0), (0, kp - K)), constant_values=ng)
            c = cand(gp, uc, mc)
            flat = c[:, : K * _GROUP]
            v, pos = grouped_topk(flat, K, group=16)
            return (jnp.maximum(v.astype(jnp.float32), -1e4).sum()
                    + pos.sum().astype(jnp.float32))
        v = jax.lax.map(one, (up.reshape(NCH, B, D),
                              pm_pl.reshape(NCH, B, -1)))
        return acc + v.sum() * 1e-30

    t_fold = timer(s_fold, total)
    print(f"fold only          : {t_fold*1e3:7.2f} ms/16k", flush=True)
    t_ft = timer(s_fold_topk, total)
    print(f"fold+topk          : {t_ft*1e3:7.2f} ms/16k "
          f"(topk ~{(t_ft-t_fold)*1e3:.2f})", flush=True)
    t_tc = timer(s_thru_cand, total)
    print(f"fold+topk+cand     : {t_tc*1e3:7.2f} ms/16k "
          f"(cand ~{(t_tc-t_ft)*1e3:.2f})", flush=True)
    t_full = timer(s_full, total)
    print(f"full               : {t_full*1e3:7.2f} ms/16k "
          f"(final ~{(t_full-t_tc)*1e3:.2f})", flush=True)


if __name__ == "__main__":
    main()
