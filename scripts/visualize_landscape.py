#!/usr/bin/env python3
"""Loss-landscape visualization around a trained checkpoint.

Parity with reference `src/visualize_landscape.py:17-50` (which wraps the
``loss-landscapes`` package): plots the training loss over a 2-D plane
spanned by two random filter-normalized directions through the checkpointed
parameters (Li et al., "Visualizing the Loss Landscape of Neural Nets").

TPU-native: the whole (steps × steps) grid of perturbed losses is computed
with a jit+vmap over direction coefficients — no per-point Python loop.

Usage:
    python scripts/visualize_landscape.py --model BPR --dataset baby \
        --checkpoint saved/BPR-baby --steps 40 --distance 10
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def filter_normalize(direction, params):
    """Per-leaf: scale the random direction to the parameter's norm."""
    def norm_one(d, p):
        dn = jnp.linalg.norm(d.reshape(-1))
        pn = jnp.linalg.norm(p.reshape(-1))
        return d * (pn / jnp.maximum(dn, 1e-10))

    return jax.tree_util.tree_map(norm_one, direction, params)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--batch_size", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--distance", type=float, default=10.0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from genmmrec_tpu.config import Config
    from genmmrec_tpu.data.arrays import build_train_data, sample_negatives
    from genmmrec_tpu.data.dataset import RecDataset
    from genmmrec_tpu.engine.checkpoint import load_checkpoint
    from genmmrec_tpu.models import get_model

    config = Config(args.model, args.dataset, {"save_recommended_topk": False})
    ds = RecDataset(config)
    train_ds, _, _ = ds.split()
    td = build_train_data(train_ds)
    model = get_model(args.model)(config, td)

    ckpt = load_checkpoint(args.checkpoint)
    params = jax.tree_util.tree_map(jnp.asarray, ckpt["params"])
    state = jax.tree_util.tree_map(jnp.asarray, ckpt.get("state") or model.init_state(jax.random.PRNGKey(0)))

    key = jax.random.PRNGKey(0)
    k1, k2, k_neg, k_loss = jax.random.split(key, 4)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    d1 = treedef.unflatten(
        [jax.random.normal(jax.random.fold_in(k1, i), l.shape) for i, l in enumerate(leaves)]
    )
    d2 = treedef.unflatten(
        [jax.random.normal(jax.random.fold_in(k2, i), l.shape) for i, l in enumerate(leaves)]
    )
    d1, d2 = filter_normalize(d1, params), filter_normalize(d2, params)

    B = min(args.batch_size, td.n_inter)
    batch = {
        "users": td.users[:B],
        "pos": td.items[:B],
        "neg": sample_negatives(k_neg, td.users[:B], td.hist, td.item_pool, td.n_pool),
        "weight": jnp.ones((B,)),
    }

    @jax.jit
    def loss_at(a, b):
        p = jax.tree_util.tree_map(lambda w, x, y: w + a * x + b * y, params, d1, d2)
        total, _ = model.loss(p, state, batch, k_loss)
        return total

    coords = jnp.linspace(-args.distance / 2, args.distance / 2, args.steps)
    grid = jax.vmap(lambda a: jax.vmap(lambda b: loss_at(a, b))(coords))(coords)
    grid = np.asarray(grid)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(12, 5))
    X, Y = np.meshgrid(np.asarray(coords), np.asarray(coords))
    cs = ax1.contourf(X, Y, grid, levels=30, cmap="viridis")
    fig.colorbar(cs, ax=ax1)
    ax1.set_title(f"{args.model}/{args.dataset} loss contours")
    ax2.plot(np.asarray(coords), grid[args.steps // 2])
    ax2.set_title("1-D slice through the checkpoint")
    ax2.set_xlabel("α")
    ax2.set_ylabel("loss")
    out = args.out or f"landscape_{args.model}_{args.dataset}.png"
    plt.savefig(out, dpi=150, bbox_inches="tight")
    print(f"Saved {out}; loss at checkpoint = {grid[args.steps // 2, args.steps // 2]:.4f}")


if __name__ == "__main__":
    main()
