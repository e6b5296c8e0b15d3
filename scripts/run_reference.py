#!/usr/bin/env python
"""Run the ACTUAL reference package (torch-CPU) end-to-end on the exported
synthetic dataset in /root/repo/data/.

This is the parity instrument VERDICT.md asks for: both frameworks read the
identical exported files (scripts/export_synthetic_dataset.py), the reference
runs its own `src/utils/quick_start.py:26` path unmodified, and the final
BEST-block metrics are compared against ours in docs/PARITY_RESULTS.md.

CUDA-extension deps are satisfied by the test shims (tests/_tg_shim.py for
torch_geometric/DGL) plus tiny stand-ins for lmdb (dormant path, end2end
False) and torch_scatter (scatter_add via index_add_). The reference source
tree stays read-only: logs/checkpoints land under ref_runs/<model>-<ds>/.

Usage:
    python scripts/run_reference.py -m BPR -d baby --epochs 50 --stopping-step 10
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_SRC = "/root/reference/GenMMRec/src"


def install_shims():
    sys.path.insert(0, os.path.join(ROOT, "tests"))
    import _tg_shim

    _tg_shim.install()
    _tg_shim.install_dgl()

    import types

    import numpy as np
    import torch

    # the reference predates numpy 1.24's alias removal (np.float etc.)
    for alias, typ in (("float", float), ("int", int), ("bool", bool), ("object", object)):
        if not hasattr(np, alias):
            setattr(np, alias, typ)

    # the reference's adjacency builders call scipy's removed private
    # dok_matrix._update (lightgcn.py:86 etc.). In scipy>=1.12 dok storage
    # lives in self._dict, NOT the dict-self — `dict.update(self, ...)` would
    # "succeed" while leaving the matrix all-zeros, so route to the internal
    # store exactly like the old private method did.
    import scipy.sparse as sp

    if not hasattr(sp.dok_matrix, "_update"):
        sp.dok_matrix._update = lambda self, data: self._dict.update(data)

    if "torchvision" not in sys.modules:
        # dormant raw-image path only (end2end False); transforms never run
        tv = types.ModuleType("torchvision")
        tv.__path__ = []  # mark as package
        tf = types.ModuleType("torchvision.transforms")
        tf.__path__ = []
        tf.Compose = lambda ops: (lambda x: x)
        tf.ToTensor = lambda *a, **k: (lambda x: x)
        tf.Normalize = lambda *a, **k: (lambda x: x)
        tff = types.ModuleType("torchvision.transforms.functional")

        def _dormant(*a, **k):
            raise RuntimeError("torchvision stub: raw-image path is dormant")

        tff.pad = _dormant
        tff.resize = _dormant
        tf.functional = tff
        tv.transforms = tf
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tf
        sys.modules["torchvision.transforms.functional"] = tff

    if "lmdb" not in sys.modules:
        lmdb = types.ModuleType("lmdb")

        def _no_lmdb(*a, **k):
            raise RuntimeError("lmdb stub: raw-image path is dormant (end2end False)")

        lmdb.open = _no_lmdb
        sys.modules["lmdb"] = lmdb

    # a few models hard-code .cuda() on tensors/modules (grcn.py:127,318);
    # on this CPU-only torch those are no-ops
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    if "torch_scatter" not in sys.modules:
        ts = types.ModuleType("torch_scatter")

        def scatter_add(src, index, dim=0, out=None, dim_size=None):
            assert dim in (0, -src.dim())
            if out is None:
                n = int(dim_size) if dim_size is not None else int(index.max()) + 1
                out = torch.zeros((n,) + tuple(src.shape[1:]), dtype=src.dtype)
            return out.index_add_(0, index, src)

        def scatter(src, index, dim=0, out=None, dim_size=None, reduce="sum"):
            if reduce in ("sum", "add"):
                return scatter_add(src, index, dim, out, dim_size)
            if reduce == "mean":
                s = scatter_add(src, index, dim, None, dim_size)
                cnt = torch.zeros(s.shape[0], dtype=src.dtype).index_add_(
                    0, index, torch.ones(index.shape[0], dtype=src.dtype)
                )
                return s / cnt.clamp(min=1).view(-1, *([1] * (src.dim() - 1)))
            raise NotImplementedError(reduce)

        ts.scatter_add = scatter_add
        ts.scatter = scatter
        sys.modules["torch_scatter"] = ts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", "-m", required=True)
    ap.add_argument("--dataset", "-d", default="baby")
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--stopping-step", type=int, default=10)
    ap.add_argument("--eval-step", type=int, default=1)
    ap.add_argument("--config-json", default="{}",
                    help="extra config_dict overrides as JSON")
    ap.add_argument("--tag", default=None,
                    help="suffix the run dir: ref_runs/<model>-<ds>-<tag>/")
    args = ap.parse_args()

    tag = f"-{args.tag}" if args.tag else ""
    run_dir = os.path.join(ROOT, "ref_runs", f"{args.model}-{args.dataset}{tag}")
    os.makedirs(run_dir, exist_ok=True)
    # the reference Config resolves YAMLs from ./configs (configurator.py:72)
    cfg_link = os.path.join(run_dir, "configs")
    if not os.path.exists(cfg_link):
        os.symlink(os.path.join(REF_SRC, "configs"), cfg_link)
    os.chdir(run_dir)

    install_shims()
    sys.path.insert(0, REF_SRC)

    import torch

    torch.set_num_threads(os.cpu_count() or 1)

    if args.model == "DualGNN":
        # dualgnn.py:129 registers result_embed as a Parameter only on CPU
        # (`nn.Parameter(...).to(device)` is identity on CPU, a plain-Tensor
        # copy on CUDA); forward:174 then assigns a plain tensor over it,
        # which torch forbids for Parameter attrs. De-register post-init to
        # reproduce the GPU behavior exactly.
        import models.dualgnn as _dg

        _orig_init = _dg.DualGNN.__init__

        def _patched_init(self, *a, **k):
            _orig_init(self, *a, **k)
            p = self._parameters.pop("result_embed", None)
            if p is not None:
                self.result_embed = p.data

        _dg.DualGNN.__init__ = _patched_init

    from utils.quick_start import quick_start  # reference's own orchestrator

    config_dict = {
        "data_path": os.path.join(ROOT, "data") + os.sep,
        "use_wandb": False,
        "epochs": args.epochs,
        "stopping_step": args.stopping_step,
        "eval_step": args.eval_step,
        "save_recommended_topk": False,
        "hyper_parameters": ["seed"],  # pin the grid to a single combo
        "seed": [999],
        "gpu_id": 0,
    }
    config_dict.update(json.loads(args.config_json))

    # the reference names some classes differently from its CLI convention
    # (src/models/rfmrec.py:25 `class RFMREC`); map ours → theirs while
    # keeping the run-dir name stable for parity_report pairing.
    ref_model = {"RFMRec": "RFMREC"}.get(args.model, args.model)

    t0 = time.time()
    quick_start(
        model=ref_model, dataset=args.dataset,
        config_dict=config_dict, save_model=False,
    )
    dt = time.time() - t0

    # harvest the final BEST block out of the newest log file
    logdir = os.path.join(run_dir, "log")
    logs = sorted(
        (os.path.join(logdir, f) for f in os.listdir(logdir)),
        key=os.path.getmtime,
    )
    text = open(logs[-1]).read()
    best = text[text.rfind("BEST"):]
    tpos = best.find("Test:")
    pat = r"([A-Za-z_%]+@\d+)\s*:\s*([0-9.]+)"
    valid = dict(re.findall(pat, best[:tpos]))
    test = dict(re.findall(pat, best[tpos:]))
    out = {
        "model": args.model, "dataset": args.dataset,
        "epochs_budget": args.epochs, "wall_s": round(dt, 1),
        "best_valid": valid, "test_upon_valid": test,
        "log": logs[-1],
    }
    result_path = os.path.join(run_dir, "result.json")
    with open(result_path, "w") as f:
        json.dump(out, f, indent=1)
    print("WROTE", result_path)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
