"""Benchmark: DiffMM epoch+eval wall-clock at Amazon-baby scale.

Prints a GenRec-V1 JSON line followed by the headline DiffMM JSON line:
    {"metric": "diffmm_baby_epoch_plus_eval_s", "value": <seconds>,
     "unit": "s", "vs_baseline": <speedup>, ...}

The workload is the BASELINE.md north-star: one full DiffMM training epoch
(denoiser training over all users + graph regeneration + BPR/CL epoch) plus
one full-catalog evaluation at baby scale (19,445 users × 7,050 items),
timed after a warm-up epoch so XLA compile time is excluded.

``vs_baseline`` preference order (recorded in ``baseline_kind``):
1. "measured": per-epoch train+eval timings parsed from an actual
   end-to-end run of the reference package on this host
   (scripts/run_reference.py writes them under ref_runs/; the reference's
   own `epoch N training [time: ..]` log lines are the source). The
   reference is torch-CPU-only here — host specs ride in the JSON.
2. "modeled": the torch-CPU op-mix estimate (reference_torch_cpu_estimate)
   when no measured run exists.

Extra roofline fields: eval full-sort GEMM FLOP/s vs the v5e bf16 peak and
effective SpMM bytes/s vs HBM peak, so the single-chip numbers can be judged
against the hardware ceiling rather than only against torch-CPU.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def run_ours(dataset: str, quick: bool):
    import jax

    from genmmrec_tpu.config import Config
    from genmmrec_tpu.data.arrays import build_eval_data, build_train_data
    from genmmrec_tpu.data.dataset import RecDataset
    from genmmrec_tpu.engine.diffusion_trainers import DiffMMTrainer
    from genmmrec_tpu.models import get_model

    config = Config(
        "DiffMM",
        dataset,
        {"save_recommended_topk": False, "epochs": 2, "use_wandb": False},
    )
    ds = RecDataset(config)
    train_ds, valid_ds, _ = ds.split()
    td = build_train_data(train_ds)
    vd = build_eval_data(valid_ds, train_ds, int(config["eval_batch_size"]))
    model = get_model("DiffMM")(config, td)
    trainer = DiffMMTrainer(config, model)

    key = jax.random.PRNGKey(0)
    params = model.init_params(key)
    trainer._state = model.init_state(key)
    _, train_epoch = trainer._build_train_step(td)
    opt = trainer._make_optimizer()
    opt_state = opt.init(params)

    def one_epoch(params, opt_state, seed):
        k = jax.random.PRNGKey(seed)
        params = trainer._epoch_prelude(params, k, seed)
        params, opt_state, trainer._state, totals = train_epoch(
            params, opt_state, trainer._state, k
        )
        jax.block_until_ready(totals)
        return params, opt_state

    def one_eval(params):
        res = trainer.evaluate(params, vd)
        return res

    # warm-up (compile)
    params, opt_state = one_epoch(params, opt_state, 0)
    one_eval(params)

    # steady state: min over two measured epochs — the remote-attached chip
    # adds multi-hundred-ms tunnel jitter a single sample inherits
    t_epoch = float("inf")
    t_eval = float("inf")
    res = None
    for seed in (1, 2):
        t0 = time.time()
        params, opt_state = one_epoch(params, opt_state, seed)
        t_epoch = min(t_epoch, time.time() - t0)
        t0 = time.time()
        res = one_eval(params)
        t_eval = min(t_eval, time.time() - t0)
    n_eval_users = vd.n_users_eval
    return {
        "epoch_s": t_epoch,
        "eval_s": t_eval,
        "eval_users_per_s": n_eval_users / t_eval,
        "recall@20": res.get("recall@20"),
        "n_users": td.n_users,
        "n_items": td.n_items,
        "n_inter": td.n_inter,
        "n_eval_users": n_eval_users,
        "train_batch": int(config["train_batch_size"]),
        "eval_batch": int(config["eval_batch_size"]),
        "steps": int(config["steps"]),
        "dims": config["dims"],
        "d_emb": int(config["d_emb_size"]),
        "latdim": int(config["embedding_size"]),
    }


def reference_measured(model: str, dataset: str):
    """Average steady-state epoch(train)+eval seconds of the ACTUAL
    reference package, parsed from its own log timers in the newest
    ref_runs/<model>-<dataset>/log/*.log (written by
    scripts/run_reference.py on this host). Returns None when no run
    exists."""
    import re

    import glob as _glob

    ref_root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "ref_runs")
    # Candidate sources: newest log file inside every <model>-<dataset>*
    # run dir (live runs), plus every committed <model>-<dataset>*.out
    # stdout capture (log/ dirs are gitignored and die with VM resets; the
    # .out files carry the same reference logger lines). All are the same
    # package on the same host reading the same data, so their per-epoch
    # timers are equally valid "measured" sources — pick whichever capture
    # has the most usable steady-state epochs (a run dir holding a
    # killed-at-epoch-0 log must NOT shadow a 35-epoch .out capture).
    candidate_paths = []
    for pat in (f"{model}-{dataset}", f"{model}-{dataset}-*"):
        for run_dir in sorted(_glob.glob(os.path.join(ref_root, pat))):
            logdir = os.path.join(run_dir, "log")
            if os.path.isdir(logdir):
                found = sorted(
                    (os.path.join(logdir, f) for f in os.listdir(logdir)),
                    key=os.path.getmtime,
                )
                if found:
                    candidate_paths.append(found[-1])
    untagged = os.path.join(ref_root, f"{model}-{dataset}.out")
    candidate_paths += sorted(
        set(_glob.glob(os.path.join(ref_root, f"{model}-{dataset}*.out")))
    )
    best, best_key = None, (0, 0)
    for path in candidate_paths:
        text_ = open(path).read()
        n_train = len(re.findall(r"training \[time: ", text_))
        n_eval = len(re.findall(r"evaluating \[time: ", text_))
        if n_train < 2 or n_eval < 1:
            continue  # unusable: reference_measured needs both timers
        key = (n_train, 1 if path == untagged else 0)
        if key > best_key:
            best, best_key = path, key
    if best is None:
        return None
    text = open(best).read()
    train_t = [float(x) for x in re.findall(r"training \[time: ([0-9.]+)s", text)]
    eval_t = [float(x) for x in re.findall(r"evaluating \[time: ([0-9.]+)s", text)]
    if len(train_t) < 2 or not eval_t:
        return None
    # skip epoch 0 (dataloader warm-up); reference evaluates valid AND test
    # each eval epoch — charge one eval per epoch like ours
    t_train = float(np.mean(train_t[1:]))
    t_eval = float(np.mean(eval_t[1:])) if len(eval_t) > 1 else float(eval_t[0])
    return {"epoch_s": t_train, "eval_s": t_eval, "epochs_seen": len(train_t),
            "log": best}


def reference_torch_cpu_estimate(stats, sample_batches: int = 2) -> float:
    """Time reference-equivalent torch-CPU work for a few batches of each
    DiffMM phase + eval, extrapolate to the full epoch.

    Mirrors the per-batch op mix of `src/common/trainer.py:487-585` (phases)
    and `src/common/trainer.py:369-388` + `src/utils/topk_evaluator.py`
    (eval). CPU tensors; measured on this host.
    """
    import torch

    torch.manual_seed(0)
    U, I, E = stats["n_users"], stats["n_items"], stats["n_inter"]
    B = stats["train_batch"]
    EB = stats["eval_batch"]
    d = stats["latdim"]
    hid = stats["dims"][0]
    steps = stats["steps"]

    n_user_batches = -(-U // B)
    n_train_batches = -(-E // B)
    n_eval_batches = -(-stats["n_eval_users"] // EB)

    # --- phase 1: Denoise MLP fwd+bwd on (B, I), two modalities ----------
    class Denoise(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.l1 = torch.nn.Linear(I + stats["d_emb"], hid)
            self.l2 = torch.nn.Linear(hid, I)

        def forward(self, x, emb):
            h = torch.tanh(self.l1(torch.cat([x, emb], -1)))
            return self.l2(h)

    dn = Denoise()
    opt = torch.optim.Adam(dn.parameters(), lr=1e-3)
    x = torch.rand(B, I)
    emb = torch.rand(B, stats["d_emb"])
    feats = torch.rand(I, d)
    t0 = time.time()
    for _ in range(sample_batches):
        opt.zero_grad()
        out = dn(x, emb)
        mse = ((x - out) ** 2).mean()
        gc = ((out @ feats - x @ feats) ** 2).mean()
        (mse + gc).backward()
        opt.step()
    t_p1 = (time.time() - t0) / sample_batches * n_user_batches * 2  # 2 modalities

    # --- phase 2: p_sample (steps × fwd) + topk + python edge loop -------
    t0 = time.time()
    with torch.no_grad():
        for _ in range(sample_batches):
            xt = x
            for _s in range(steps):
                xt = dn(xt, emb)
            _, idx = torch.topk(xt, k=1)
    t_p2_fwd = (time.time() - t0) / sample_batches * n_user_batches * 2
    # reference edge loop: U×k python-loop appends (trainer.py:548-562)
    t0 = time.time()
    u_list, i_list = [], []
    idx_np = idx.numpy()
    for i in range(min(B, idx_np.shape[0])):
        for j in range(idx_np.shape[1]):
            u_list.append(int(i))
            i_list.append(int(idx_np[i][j]))
    t_loop = (time.time() - t0) / B * U * 2
    t_p2 = t_p2_fwd + t_loop

    # --- phase 3: sparse-adj propagation fwd+bwd per train batch ---------
    N = U + I
    nnz = 2 * E
    rows = torch.randint(0, N, (nnz,))
    cols = torch.randint(0, N, (nnz,))
    adj = torch.sparse_coo_tensor(
        torch.stack([rows, cols]), torch.rand(nnz), (N, N)
    ).coalesce()
    embeds = torch.rand(N, d, requires_grad=True)
    t0 = time.time()
    for _ in range(sample_batches):
        h = embeds
        for _l in range(6):  # forward_MM ≈6 spmm passes (diffmm.py:129-169)
            h = torch.sparse.mm(adj, h)
        loss = h.sum()
        loss.backward()
        embeds.grad = None
    t_p3 = (time.time() - t0) / sample_batches * n_train_batches

    # --- eval: full-sort GEMM + topk + host bool-matrix loop -------------
    ue = torch.rand(EB, d)
    ie = torch.rand(I, d)
    t0 = time.time()
    for _ in range(sample_batches):
        scores = ue @ ie.T
        _, topk_idx = torch.topk(scores, min(50, I), dim=-1)
    t_eval_gemm = (time.time() - t0) / sample_batches * n_eval_batches
    # reference per-user python hit loop (topk_evaluator.py:109-112)
    topk_np = topk_idx.numpy()
    gt = [set(np.random.randint(0, I, 10).tolist()) for _ in range(EB)]
    t0 = time.time()
    bool_rec = []
    for m, n in zip(gt, topk_np):
        bool_rec.append([True if i in m else False for i in n])
    t_hit = (time.time() - t0) / EB * stats["n_eval_users"]
    t_eval = t_eval_gemm + t_hit

    return t_p1 + t_p2 + t_p3 + t_eval


def run_genrecv1(dataset: str):
    """Secondary headline (BASELINE.md): GenRec-V1 epoch+eval wall-clock,
    reported as a comment line; the JSON line stays DiffMM."""
    import jax

    from genmmrec_tpu.config import Config
    from genmmrec_tpu.data.arrays import build_eval_data, build_train_data
    from genmmrec_tpu.data.dataset import RecDataset
    from genmmrec_tpu.engine.diffusion_trainers import GenRecV1Trainer
    from genmmrec_tpu.models import get_model

    config = Config(
        "GenRecV1", dataset, {"save_recommended_topk": False, "use_wandb": False}
    )
    for k in config["hyper_parameters"]:
        v = config[k]
        if isinstance(v, list):
            config[k] = v[0]
    ds = RecDataset(config)
    train_ds, valid_ds, _ = ds.split()
    td = build_train_data(train_ds)
    vd = build_eval_data(valid_ds, train_ds, int(config["eval_batch_size"]))
    model = get_model("GenRecV1")(config, td)
    trainer = GenRecV1Trainer(config, model)
    key = jax.random.PRNGKey(0)
    params = model.init_params(key)
    trainer._state = model.init_state(key)
    _, train_epoch = trainer._build_train_step(td)
    opt = trainer._make_optimizer()
    opt_state = opt.init(params)

    def one_epoch(params, opt_state, seed):
        k = jax.random.PRNGKey(seed)
        params = trainer._epoch_prelude(params, k, seed)
        params, opt_state, trainer._state, totals = train_epoch(
            params, opt_state, trainer._state, k
        )
        jax.block_until_ready(totals)
        return params, opt_state

    params, opt_state = one_epoch(params, opt_state, 0)  # compile
    params, opt_state = one_epoch(params, opt_state, 1)  # type fixpoint
    trainer.evaluate(params, vd)
    t0 = time.time()
    params, opt_state = one_epoch(params, opt_state, 2)
    t_epoch = time.time() - t0
    t0 = time.time()
    trainer.evaluate(params, vd)
    t_eval = time.time() - t0
    return t_epoch, t_eval


# v5e single-chip peaks (public TPU v5e specs): bf16 MXU and HBM bandwidth
_V5E_BF16_FLOPS = 197e12
_V5E_HBM_BYTES = 819e9


def fullsort_roofline(n_items=63001, d=64, B=4096, n_chunks=4, max_k=50):
    """Full-sort eval scoring at elec catalog width (63,001 items), the scale
    where the op is genuinely bandwidth-bound (VERDICT r2 item 6; baby-scale
    numbers are latency-bound and meaningless as rooflines).

    Measures the exact per-chunk eval op mix — (B, d) @ (d, I) GEMM, train-
    positive mask, lax.top_k — in f32 and in the bf16 scoring path
    (models/base.py scores_cached). At d=64 the arithmetic intensity of the
    score matrix is 2d FLOPs per element against one HBM write (GEMM out)
    plus one read (top-k in): the op cannot approach the MXU peak; the honest
    ceiling is HBM. bytes counted: score write + top-k read + operand reads.
    """
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    u_emb = jnp.asarray(rng.standard_normal((B * n_chunks, d), np.float32))
    i_emb = jnp.asarray(rng.standard_normal((n_items, d), np.float32))
    # bit-packed train-positive mask, the production eval representation
    # (engine/trainer.py _dense_mask): ~30 positives per user, pad columns
    # (to the 128-lane group boundary) marked masked; the item table is
    # zero-padded once, mirroring the trainer's padfree GEMM-form eval
    n_pad = -(-n_items // 128) * 128
    mask_idx = rng.integers(0, n_items, (B * n_chunks, 30))
    dense = np.zeros((B * n_chunks, n_pad), bool)
    dense[:, n_items:] = True
    dense[np.arange(B * n_chunks)[:, None], mask_idx] = True
    mask = jnp.asarray(np.packbits(dense, axis=1, bitorder="little"))
    i_emb_pad = jnp.pad(i_emb, ((0, n_pad - n_items), (0, 0)))

    def run(dtype, exact_grouped=True, fused=False):
        from genmmrec_tpu.ops.topk import grouped_topk

        if fused:
            # the production single-chip bf16 eval path (engine/trainer.py
            # fused_form): score+mask+top-k in one Pallas kernel, the
            # (B, n_items) score plane never written to HBM
            from genmmrec_tpu.ops.fused_topk import (
                fused_grouped_topk, pack_planar_mask,
            )

            dense_np = np.asarray(dense[:, :n_items])
            pmask = jnp.asarray(pack_planar_mask(dense_np))

        ue = u_emb.astype(dtype)
        ie = (i_emb_pad if exact_grouped else i_emb).astype(dtype)

        # the axon-attached chip dispatches asynchronously and its
        # block_until_ready is not a reliable completion barrier (observed
        # 45 µs "timings" for a 16k x 63k score+top-k program). Timing
        # contract here: iterations are serialized through a scalar carry
        # (each iteration's input depends on the previous output), the
        # final value is read back to host, and dispatch+readback overhead
        # is cancelled by differencing an n-iteration chain against a
        # 1-iteration chain of the same executable.
        @jax.jit
        def chained(acc):
            # 1e-38 * acc is far below score magnitudes; it only forces
            # the data dependence (XLA cannot fold x + tiny*acc)
            up = ue + (acc * jnp.asarray(1e-38, jnp.float32)).astype(dtype)

            def one(args):
                u, m = args
                if fused:
                    v, _ = fused_grouped_topk(u, ie[:n_items], max_k, m)
                    return v
                scores = u @ ie.T
                if exact_grouped:
                    # the production eval path: bit-packed mask fused into
                    # the grouped top-k fold (ops/topk.py)
                    v, _ = grouped_topk(scores, max_k, packed_mask=m)
                else:  # the pre-r4 path: masked plane + full-row lax.top_k
                    bits = (
                        m[:, :, None] >> jnp.arange(8, dtype=jnp.uint8)
                    ) & jnp.uint8(1)
                    mb = bits.reshape(m.shape[0], -1)[:, :n_items] != 0
                    scores = jnp.where(mb, jnp.asarray(-1e10, dtype), scores)
                    v, _ = jax.lax.top_k(scores, max_k)
                return v

            uc = up.reshape(n_chunks, B, d)
            mc = (pmask if fused else mask).reshape(n_chunks, B, -1)
            v = jax.lax.map(one, (uc, mc))
            # masked tails surface finfo(bf16).min sentinels on the fused
            # path — clip before the carry sum so they cannot overflow it
            v = jnp.maximum(v.astype(jnp.float32), -1e4)
            return acc + v.sum() * 1e-30

        def chain(n):
            acc = jnp.float32(0.0)
            t0 = time.time()
            for _ in range(n):
                acc = chained(acc)
            np.asarray(acc)  # host readback: the only reliable barrier
            return time.time() - t0

        chain(1)  # compile + warm
        n = 6
        t1 = min(chain(1) for _ in range(2))
        tn = min(chain(n) for _ in range(2))
        dt = max(tn - t1, 1e-9) / (n - 1)
        esize = jnp.dtype(dtype).itemsize
        total_users = B * n_chunks
        # score write (GEMM) + score read (mask+top-k) + operand reads
        bytes_moved = (
            2 * total_users * n_items * esize
            + n_chunks * n_items * d * esize
            + total_users * d * esize
        )
        flops = 2.0 * total_users * d * n_items
        return {
            "s": dt,
            "users_per_s": total_users / dt,
            "bytes_per_s": bytes_moved / dt,
            "frac_hbm_peak": bytes_moved / dt / _V5E_HBM_BYTES,
            "frac_bf16_peak": flops / dt / _V5E_BF16_FLOPS,
        }

    f32 = run(np.float32)
    grouped_bf16 = run(jnp.bfloat16)
    lax_bf16 = run(jnp.bfloat16, exact_grouped=False)
    # the production bf16 eval path: on TPU the fully fused Pallas kernel
    # (engine/trainer.py fused_form), elsewhere the grouped top-k.
    # frac_hbm_peak keeps the UNFUSED traffic model (score write + read) as
    # its byte count, so for the fused kernel — which never moves the score
    # plane — it reads as effective bandwidth vs the materializing path and
    # can legitimately exceed what the actual traffic would allow.
    if jax.default_backend() == "tpu":
        bf16 = run(jnp.bfloat16, fused=True)
    else:
        bf16 = grouped_bf16
    return {
        "fullsort_elec_f32_s": f32["s"],
        "fullsort_elec_f32_frac_hbm_peak": f32["frac_hbm_peak"],
        "fullsort_elec_bf16_s": bf16["s"],
        "fullsort_elec_bf16_frac_hbm_peak": bf16["frac_hbm_peak"],
        "fullsort_elec_bf16_users_per_s": bf16["users_per_s"],
        "fullsort_elec_bf16_frac_bf16_peak": bf16["frac_bf16_peak"],
        "fullsort_bf16_speedup": f32["s"] / bf16["s"],
        "fullsort_elec_unfused_bf16_s": grouped_bf16["s"],
        "fullsort_fused_speedup": grouped_bf16["s"] / bf16["s"],
        "fullsort_elec_laxtopk_bf16_s": lax_bf16["s"],
        "fullsort_grouped_topk_speedup": lax_bf16["s"] / grouped_bf16["s"],
    }


def spmm_roofline_elec(n_users=192403, n_items=63001, n_inter=1689188, d=64):
    """Hot-SpMM bandwidth at elec scale (the shape VERDICT r2 item 6 asks
    for) on a synthetic uniform graph with the real nnz — bandwidth depends
    on nnz/N/d, not on which edges exist. Uses the production spmm path
    (Pallas row-blocked kernel when the planner selects it)."""
    import jax
    import jax.numpy as jnp

    from genmmrec_tpu.ops.graph import bipartite_norm_adj, spmm

    rng = np.random.default_rng(0)
    users = rng.integers(0, n_users, n_inter).astype(np.int64)
    items = rng.integers(0, n_items, n_inter).astype(np.int64)
    adj = bipartite_norm_adj(users, items, n_users, n_items).with_span()
    x = jnp.asarray(
        rng.standard_normal((n_users + n_items, d), np.float32)
    )
    f = jax.jit(lambda x: spmm(adj, x))
    f(x).block_until_ready()
    n = 10
    t0 = time.time()
    y = x
    for _ in range(n):
        y = f(y)
    y.block_until_ready()
    dt = (time.time() - t0) / n
    nnz = adj.nnz
    bytes_moved = nnz * d * 4 + 2 * x.shape[0] * d * 4 + nnz * 8
    return {
        "spmm_elec_s": dt,
        "spmm_elec_bytes_per_s": bytes_moved / dt,
        "spmm_elec_frac_hbm_peak": bytes_moved / dt / _V5E_HBM_BYTES,
    }


def spmm_roofline(dataset: str):
    """Effective bytes/s of the hot SpMM (normalized adjacency x embeddings)
    vs HBM peak. Bytes counted as the kernel's unavoidable traffic:
    gathered rows (nnz*d), output (N*d), vals+cols indices."""
    import jax
    import jax.numpy as jnp

    from genmmrec_tpu.config import Config
    from genmmrec_tpu.data.arrays import build_train_data
    from genmmrec_tpu.data.dataset import RecDataset
    from genmmrec_tpu.models import get_model

    config = Config("LightGCN", dataset, {"save_recommended_topk": False})
    ds = RecDataset(config)
    train_ds, _, _ = ds.split()
    td = build_train_data(train_ds)
    model = get_model("LightGCN")(config, td)
    params = model.init_params(jax.random.PRNGKey(0))
    from genmmrec_tpu.ops.graph import spmm

    adj = model.norm_adj
    x = jnp.concatenate([params["user_emb"], params["item_emb"]], axis=0)
    f = jax.jit(lambda x: spmm(adj, x))
    f(x).block_until_ready()  # compile
    n = 20
    t0 = time.time()
    y = x
    for _ in range(n):
        y = f(y)
    y.block_until_ready()
    dt = (time.time() - t0) / n
    d = x.shape[1]
    nnz = adj.rows.shape[0]
    bytes_moved = nnz * d * 4 + x.shape[0] * d * 4 + nnz * 8
    return {
        "spmm_s": dt,
        "spmm_bytes_per_s": bytes_moved / dt,
        "spmm_frac_hbm_peak": bytes_moved / dt / _V5E_HBM_BYTES,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="baby")
    ap.add_argument("--quick", action="store_true", help="tiny dataset sanity run")
    ap.add_argument(
        "--no-genrecv1", action="store_true", help="skip the GenRec-V1 line"
    )
    args = ap.parse_args()

    dataset = "tiny" if args.quick else args.dataset

    # ---- GenRec-V1 (second north-star): its own JSON line ---------------
    if not args.no_genrecv1:
        try:
            g_epoch, g_eval = run_genrecv1(dataset)
            g_ref = reference_measured("GenRecV1", dataset)
            g_vs = (
                (g_ref["epoch_s"] + g_ref["eval_s"]) / (g_epoch + g_eval)
                if g_ref
                else 0.0
            )
            print(
                json.dumps(
                    {
                        "metric": "genrecv1_baby_epoch_plus_eval_s",
                        "value": round(g_epoch + g_eval, 3),
                        "unit": "s",
                        "vs_baseline": round(g_vs, 2),
                        "baseline_kind": "measured" if g_ref else "none",
                    }
                )
            )
        except Exception as e:
            print(f"# genrecv1 bench failed: {e}")

    # ---- DiffMM headline -------------------------------------------------
    stats = run_ours(dataset, args.quick)
    ours = stats["epoch_s"] + stats["eval_s"]

    ref_meas = reference_measured("DiffMM", dataset)
    if ref_meas is not None:
        ref = ref_meas["epoch_s"] + ref_meas["eval_s"]
        baseline_kind = "measured"
        print(
            f"# reference (actual package, torch-CPU this host): "
            f"epoch={ref_meas['epoch_s']:.2f}s eval={ref_meas['eval_s']:.2f}s "
            f"over {ref_meas['epochs_seen']} epochs ({ref_meas['log']})"
        )
    else:
        try:
            ref = reference_torch_cpu_estimate(stats)
            baseline_kind = "modeled"
        except Exception as e:  # torch missing or OOM — report ratio 0
            print(f"# reference estimate failed: {e}")
            ref, baseline_kind = 0.0, "none"
    vs = (ref / ours) if ours > 0 and ref > 0 else 0.0

    # roofline: eval full-sort GEMM FLOP/s (lower bound — eval also runs
    # graph propagation) and hot-SpMM HBM fraction
    gemm_flops = (
        2.0 * stats["n_eval_users"] * stats["latdim"] * stats["n_items"]
        / stats["eval_s"]
    )
    try:
        roof = spmm_roofline(dataset)
    except Exception as e:
        print(f"# spmm roofline failed: {e}")
        roof = {}
    if not args.quick:
        # elec-scale rooflines: the scales where eval scoring and SpMM are
        # genuinely bandwidth-bound (VERDICT r2 item 6). Synthetic shapes —
        # bandwidth depends on dims/nnz, not edge identity.
        try:
            roof.update(fullsort_roofline())
        except Exception as e:
            print(f"# fullsort roofline failed: {e}")
        try:
            roof.update(spmm_roofline_elec())
        except Exception as e:
            print(f"# elec spmm roofline failed: {e}")
    print(
        f"# ours: epoch={stats['epoch_s']:.2f}s eval={stats['eval_s']:.2f}s "
        f"({stats['eval_users_per_s']:.0f} users/s), reference: {ref:.2f}s "
        f"[{baseline_kind}]"
    )
    print(
        json.dumps(
            {
                "metric": "diffmm_baby_epoch_plus_eval_s",
                "value": round(ours, 3),
                "unit": "s",
                "vs_baseline": round(vs, 2),
                "baseline_kind": baseline_kind,
                "baseline_host": "torch-CPU 1 core (reference has no TPU path)",
                "epoch_s": round(stats["epoch_s"], 3),
                "eval_s": round(stats["eval_s"], 3),
                "eval_users_per_s": round(stats["eval_users_per_s"], 1),
                "eval_gemm_flops_per_s": round(gemm_flops, 1),
                "eval_gemm_frac_bf16_peak": round(gemm_flops / _V5E_BF16_FLOPS, 5),
                **{k: (round(v, 4) if isinstance(v, float) else v) for k, v in roof.items()},
            }
        )
    )


if __name__ == "__main__":
    main()
    # the remote-chip tunnel's client subprocess can wedge the interpreter
    # in its exit handlers (observed: completed runs stuck in do_wait);
    # everything is flushed, so exit hard
    import sys as _sys

    _sys.stdout.flush()
    _sys.stderr.flush()
    os._exit(0)
