#!/usr/bin/env python
"""Elec-scale validation run (VERDICT r1 next-step #6).

Runs the diffusion models at the reference's LARGEST dataset scale —
elec: 192,403 users x 63,001 items, 1.69M interactions
(`/root/reference/GenMMRec/evaluation/README.md:10`) — on the real chip:
a couple of full epochs (diffusion phases + BPR epoch) plus a complete
valid+test evaluation, recording wall-clock per epoch/eval and peak HBM.
This exercises the machinery built for SURVEY hard parts #4/#5 at the
scale it was designed for: dense (B, n_items) diffusion vectors, chunked
full-catalog eval, bit-packed train masks, blocked KNN graph builds.

Writes comparison_logs/elec_scale.json and prints a markdown table for
docs/ELEC_SCALE.md.

Usage:
    python scripts/elec_scale.py [--models DiffRec DiffMM] [--epochs 2]
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

# surface the trainers' phase-boundary INFO lines (diffusion loss / regen
# timings) — without this the per-phase fault attribution is invisible
logging.basicConfig(
    level=logging.INFO, format="%(asctime)s %(message)s", stream=sys.stdout
)


def peak_hbm_gb():
    import jax

    for dev in jax.devices():
        try:
            stats = dev.memory_stats() or {}
        except Exception:
            continue
        v = stats.get("peak_bytes_in_use") or stats.get("bytes_in_use")
        if v:
            return round(v / 2**30, 2)
    return None


DATASET = "elec"


def run_model(model_name: str, epochs: int, probe_only: bool = False,
              config_extra: dict | None = None):
    import jax

    from genmmrec_tpu.config import Config
    from genmmrec_tpu.data.arrays import build_eval_data, build_train_data
    from genmmrec_tpu.data.dataset import RecDataset
    from genmmrec_tpu.engine.trainer import get_trainer
    from genmmrec_tpu.models import get_model
    from genmmrec_tpu.utils.misc import init_seed

    t0 = time.time()
    config = Config(model_name, DATASET, {
        "epochs": epochs,
        "stopping_step": epochs + 1,
        "eval_step": epochs,           # one full valid+test eval at the end
        "save_recommended_topk": False,
        "hyper_parameters": ["seed"],
        # cap batches per device program: graph-propagating models (DiffMM)
        # would otherwise run one multi-hour XLA program per epoch, which
        # the TPU runtime kills as a dead worker
        "scan_slice_batches": 32,
        **(config_extra or {}),
    })
    init_seed(int(config["seed"][0] if isinstance(config["seed"], list)
                  else config["seed"]))
    ds = RecDataset(config)
    train, valid, test = ds.split()
    t_data = time.time() - t0

    t0 = time.time()
    td = build_train_data(train)
    ebs = int(config["eval_batch_size"])
    vd = build_eval_data(valid, train, ebs)
    sd = build_eval_data(test, train, ebs)
    model = get_model(model_name)(config, td)
    trainer = get_trainer(model_name)(config, model)
    t_build = time.time() - t0

    t0 = time.time()
    if probe_only:
        # memory probes only -- skip training/eval entirely so the AOT
        # probe programs get the whole chip (running them after a full fit
        # leaves the fit's buffers alive and the probe OOMs)
        score, valid_res, test_res = float("nan"), {}, {}
    else:
        score, valid_res, test_res = trainer.fit(td, vd, sd, saved=False)
    t_fit = time.time() - t0

    # micro-profile: attribute per-batch cost at this scale (one SpMM pass
    # over the static adjacency vs one full loss+grad batch) so the epoch
    # time decomposes against the kernel roofline (docs/ROOFLINE.md)
    prof = {}
    try:
        import jax.numpy as jnp

        from genmmrec_tpu.ops.graph import spmm

        if getattr(model, "norm_adj", None) is not None:
            x = jnp.zeros((model.norm_adj.n_rows, 64), jnp.float32)
            f = jax.jit(lambda x: spmm(model.norm_adj, x))
            f(x).block_until_ready()
            t0 = time.time()
            for _ in range(10):
                x = f(x)
            x.block_until_ready()
            prof["spmm_pass_ms"] = round((time.time() - t0) / 10 * 1e3, 2)
    except Exception as e:
        prof["spmm_pass_err"] = str(e)[:200]
    try:
        params = model.init_params(jax.random.PRNGKey(0))
        state = model.init_state(jax.random.PRNGKey(1))
        B = int(config["train_batch_size"])
        batch = {
            "users": jnp.zeros(B, jnp.int32),
            "pos": jnp.zeros(B, jnp.int32),
            "neg": jnp.ones(B, jnp.int32),
            "weight": jnp.ones(B, jnp.float32),
        }
        # buffers ride as ARGUMENTS (model.bound), not captured constants:
        # AOT lowering serializes captured graph buffers into the HLO proto
        # and the tunnel rejects the >100MB request body (HTTP 413)
        def _lg(p, s, b, k, buffers):
            with model.bound(buffers):
                return jax.value_and_grad(
                    lambda q: model.loss(q, s, b, k)[0]
                )(p)

        lg = jax.jit(_lg)
        k = jax.random.PRNGKey(2)
        bufs = model.buffers()
        # AOT-compile once: gives both the callable for timing and XLA's
        # static memory analysis (axon's dev.memory_stats() is empty over
        # the tunnel, so the compiled-program footprint is the recordable
        # HBM number — see scripts/probe_hbm.py)
        lg_c = lg.lower(params, state, batch, k, bufs).compile()
        prof["loss_grad_temps_gb"] = round(
            lg_c.memory_analysis().temp_size_in_bytes / 2**30, 3
        )
        jax.block_until_ready(lg_c(params, state, batch, k, bufs))
        t0 = time.time()
        for _ in range(3):
            out = lg_c(params, state, batch, k, bufs)
        jax.block_until_ready(out)
        prof["loss_grad_batch_ms"] = round((time.time() - t0) / 3 * 1e3, 2)
    except Exception as e:
        prof["loss_grad_err"] = str(e)[:200]

    # static HBM accounting (params + adam moments + device-resident model
    # buffers/data + the eval-chunk program's temps): the peak for these
    # models is eval-side -- the (B_eval, n_items) score block
    try:
        import jax.numpy as jnp

        def tree_gb(t):
            return sum(
                a.size * a.dtype.itemsize
                for a in jax.tree_util.tree_leaves(t)
                if hasattr(a, "dtype")
            ) / 2**30

        params_gb = tree_gb(params)
        bufs_gb = tree_gb(model.buffers()) + tree_gb(
            {"u": td.users, "i": td.items}
        )
        users = jnp.zeros((ebs,), jnp.int32)

        k_eff = min(50, int(model.n_items))

        def eval_chunk(p, s, u, buffers):
            with model.bound(buffers):
                return jax.lax.top_k(model.scores(p, s, u), k_eff)

        eval_gb = 0.0
        try:
            ma = jax.jit(eval_chunk).lower(
                params, state, users, model.buffers()
            ).compile()
            ev = ma.memory_analysis()
            eval_gb = (
                ev.temp_size_in_bytes + ev.output_size_in_bytes
            ) / 2**30
        except Exception as e:
            prof["eval_probe_err"] = str(e)[:200]
        prof["hbm_static_gb"] = round(
            3 * params_gb + bufs_gb
            + max(eval_gb, prof.get("loss_grad_temps_gb", 0.0)), 2
        )
        prof["hbm_static_parts_gb"] = {
            "params_x3_adam": round(3 * params_gb, 2),
            "buffers": round(bufs_gb, 2),
            "eval_chunk_temps": round(eval_gb, 2),
        }
    except Exception as e:
        prof["hbm_static_err"] = str(e)[:200]

    return {
        **prof,
        "model": model_name,
        "n_users": int(model.n_users), "n_items": int(model.n_items),
        "n_inter_train": int(td.n_inter),
        "epochs": epochs,
        "data_s": round(t_data, 1), "build_s": round(t_build, 1),
        "fit_s": round(t_fit, 1),
        "fit_s_per_epoch": round(t_fit / max(1, epochs), 1),
        # steady-state epoch time: min over recorded epochs (first epoch
        # carries the XLA compiles; VERDICT r4 weak #6 asked for the split)
        "fit_s_per_epoch_steady": (
            round(min(trainer.epoch_times[1:]), 1)
            if len(trainer.epoch_times) >= 2 else None
        ),
        "fit_s_epoch0": (
            round(trainer.epoch_times[0], 1) if trainer.epoch_times else None
        ),
        "peak_hbm_gb": peak_hbm_gb() or prof.get("hbm_static_gb"),
        "valid_recall@20": float(valid_res.get("recall@20", float("nan"))),
        "test_recall@20": float(test_res.get("recall@20", float("nan"))),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", nargs="*", default=["DiffRec", "DiffMM"])
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--dataset", default="elec",
                    help="override for smoke-testing the harness itself")
    ap.add_argument("--probe-only", action="store_true",
                    help="memory probes only; merge into existing entries "
                         "without touching recorded timings/metrics")
    ap.add_argument("--config-json", default="{}",
                    help="extra Config overrides (e.g. '{\"remat_gcn\": 0}' "
                         "for the DiffMM NaN/remat discrimination runs)")
    ap.add_argument("--tag", default="",
                    help="suffix for the results key (diagnostic runs land "
                         "as e.g. DiffMM<tag> instead of clobbering DiffMM)")
    args = ap.parse_args()
    config_extra = json.loads(args.config_json)

    global DATASET
    DATASET = args.dataset
    out_path = os.path.join(
        ROOT, "comparison_logs", f"{args.dataset}_scale.json"
    )
    results = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            results = json.load(f)

    for m in args.models:
        print(f"=== {m} @ elec scale ===", flush=True)
        mk = m + args.tag
        try:
            r = run_model(m, args.epochs, probe_only=args.probe_only,
                          config_extra=config_extra)
            if args.probe_only:
                keep = {
                    k: v for k, v in r.items()
                    if "hbm" in k or "probe" in k or "temps" in k
                }
                results[mk] = {**results.get(mk, {}), **keep}
            else:
                results[mk] = r
        except Exception as e:  # record OOM/compile failures honestly
            results[mk] = {"model": m, "error": f"{type(e).__name__}: {e}"[:6000]}
        with open(out_path, "w") as f:
            json.dump(results, f, indent=2)
            f.write("\n")
        print(json.dumps(results[m]), flush=True)

    lines = [
        "# Elec-scale validation",
        "",
        "Diffusion models at the reference's largest dataset scale — elec: "
        "192,403 users x 63,001 items, 1.69M interactions "
        "(`/root/reference/GenMMRec/evaluation/README.md:10`) — on one real "
        "TPU chip: full epochs (diffusion phases + BPR epoch) plus a complete "
        "valid+test evaluation. The reference has no counterpart run (it is "
        "single-GPU and publishes no elec wall-clock). Exercises the dense "
        "(B, n_items) diffusion vectors, chunked full-catalog eval, and "
        "bit-packed train masks at the scale they were designed for "
        "(SURVEY hard parts #4/#5). Generated by `scripts/elec_scale.py`.",
        "",
        "HBM column: the axon tunnel exposes no runtime `memory_stats()` "
        "(`scripts/probe_hbm.py`), so the recorded number is the XLA static "
        "accounting — params + Adam moments + device-resident buffers + the "
        "larger of the compiled eval-chunk / loss-grad program temps "
        "(`hbm_static_parts_gb` in `comparison_logs/elec_scale.json`).",
        "",
        "| Model | data s | build s | fit s/epoch | peak HBM GB | valid R@20 | test R@20 |",
        "|---|---|---|---|---|---|---|",
    ]
    for m, r in results.items():
        if "error" in r:
            lines.append(f"| {m} | ERROR: `{r['error'][:120]}` | | | | | |")
        else:
            lines.append(
                f"| {m} | {r['data_s']} | {r['build_s']} | "
                f"{r['fit_s_per_epoch']} | "
                f"{r.get('peak_hbm_gb') or r.get('hbm_static_gb')} | "
                f"{r['valid_recall@20']:.4f} | {r['test_recall@20']:.4f} |"
            )
    text = "\n".join(lines) + "\n"
    print("\n" + text)
    if args.dataset == "elec":
        doc = os.path.join(ROOT, "docs", "ELEC_SCALE.md")
        with open(doc, "w") as f:
            f.write(text)
        print("WROTE", doc)


if __name__ == "__main__":
    main()
