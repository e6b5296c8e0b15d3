"""Per-model smoke tests: loss is finite + differentiable, scores have the
right shape. The TPU analog of the reference's verify_*.py mock scripts
(`/root/reference/verify_diffrec.py:13-65` pattern).
"""

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow

MODELS = [
    "BPR",
    "VBPR",
    "LightGCN",
    "BM3",
    "FREEDOM",
    "GUME",
    "LATTICE",
    "LayerGCN",
    "SELFCFED_LGN",
    "ItemKNNCBF",
    "MMGCN",
    "MGCN",
    "LGMRec",
    "GRCN",
    "DualGNN",
    "SMORE",
    "PGL",
    "DRAGON",
    "COHESION",
    "SLMRec",
    "MVGAE",
    "DAMRS",
]


@pytest.fixture(scope="module")
def tiny_env():
    from genmmrec_tpu.config import Config
    from genmmrec_tpu.data.arrays import build_train_data
    from genmmrec_tpu.data.dataset import RecDataset

    config = Config("BPR", "tiny", {"save_recommended_topk": False})
    ds = RecDataset(config)
    train_ds, _, _ = ds.split()
    return config, build_train_data(train_ds)


def _model_config(name):
    from genmmrec_tpu.config import Config

    return Config(name, "tiny", {"save_recommended_topk": False})


@pytest.mark.parametrize("name", MODELS)
def test_model_contract(tiny_env, name):
    from genmmrec_tpu.models import get_model

    _, td = tiny_env
    config = _model_config(name)
    model = get_model(name)(config, td)

    key = jax.random.PRNGKey(0)
    params = model.init_params(key)
    state = model.init_state(key)
    state = model.pre_epoch(params, state, jax.random.PRNGKey(1), 0)

    B = 16
    batch = {
        "users": td.users[:B],
        "pos": td.items[:B],
        "neg": (td.items[:B] + 1) % td.n_items,
        "weight": np.ones(B, np.float32),
    }
    total, parts = model.loss(params, state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(total)), f"{name} loss not finite"

    grads = jax.grad(lambda p: model.loss(p, state, batch, jax.random.PRNGKey(2))[0])(params)
    gnorm = sum(float((g**2).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm), f"{name} grads nan"
    if name != "ItemKNNCBF":  # non-parametric: zero grads by design
        assert gnorm > 0, f"{name} grads zero"

    scores = model.scores(params, state, td.users[:8])
    assert scores.shape == (8, td.n_items)
    assert np.isfinite(np.asarray(scores)).all()
