"""Parameter hygiene: no weak-typed leaves in any model's init_params.

A weak-typed param (e.g. ``jnp.full(shape, 0.01)`` with a python float)
flips its optimizer-state aval to strong after the first update, forcing
expensive jit retraces of every epoch-level function that closes over it
(observed: two ~50s GenRecV1 recompiles per run on v5e)."""

import jax
import numpy as np
import pytest

MODELS = [
    "BPR", "VBPR", "LightGCN", "BM3", "FREEDOM", "GUME", "LATTICE",
    "LayerGCN", "SELFCFED_LGN", "MMGCN", "MGCN", "LGMRec", "GRCN",
    "DualGNN", "SMORE", "PGL", "DRAGON", "COHESION", "SLMRec", "MVGAE",
    "DAMRS", "DiffRec", "DiffMM", "DDRM", "MCDRec", "CoDMR", "LD4MRec",
    "DiffGraph", "GenRecV1", "GenRecBM3", "MVDiff", "RFGUME", "RFMRec",
]


@pytest.fixture(scope="module")
def tiny_td():
    from genmmrec_tpu.config import Config
    from genmmrec_tpu.data.arrays import build_train_data
    from genmmrec_tpu.data.dataset import RecDataset

    config = Config("BPR", "tiny", {"save_recommended_topk": False})
    ds = RecDataset(config)
    train_ds, _, _ = ds.split()
    return build_train_data(train_ds)


@pytest.mark.parametrize("name", MODELS)
def test_no_weak_typed_params(tiny_td, name):
    from genmmrec_tpu.config import Config
    from genmmrec_tpu.models import get_model

    config = Config(name, "tiny", {"save_recommended_topk": False})
    model = get_model(name)(config, tiny_td)
    params = model.init_params(jax.random.PRNGKey(0))
    weak = [
        jax.tree_util.keystr(path)
        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]
        if getattr(jax.api_util.shaped_abstractify(leaf), "weak_type", False)
    ]
    assert not weak, f"{name} has weak-typed param leaves (retrace hazard): {weak[:5]}"
