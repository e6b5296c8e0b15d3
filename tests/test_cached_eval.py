"""Cached full-sort evaluation must match direct per-chunk scoring.

The trainer computes ``eval_artifacts`` once per evaluation and scores each
user-chunk via ``scores_cached`` (trainer.py); the reference instead re-runs
the full forward per eval batch (`src/common/trainer.py:379-387`). These
tests pin the two paths to identical outputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from genmmrec_tpu.config import Config
from genmmrec_tpu.data.arrays import build_train_data
from genmmrec_tpu.data.dataset import RecDataset
from genmmrec_tpu.models import get_model
from genmmrec_tpu.models.base import RecModel

MODELS = [
    "BPR",
    "LightGCN",
    "BM3",
    "FREEDOM",
    "GUME",
    "MGCN",
    "LGMRec",
    "DualGNN",
    "SLMRec",
    "SELFCFED_LGN",
    "DDRM",
    "DiffMM",
]


@pytest.fixture(scope="module")
def tiny_td():
    config = Config("BPR", "tiny", {"save_recommended_topk": False})
    ds = RecDataset(config)
    train_ds, _, _ = ds.split()
    return build_train_data(train_ds)


@pytest.mark.parametrize("name", MODELS)
def test_cached_matches_direct(tiny_td, name):
    config = Config(name, "tiny", {"save_recommended_topk": False})
    model = get_model(name)(config, tiny_td)
    params = model.init_params(jax.random.PRNGKey(0))
    state = model.init_state(jax.random.PRNGKey(1))
    state = model.pre_epoch(params, state, jax.random.PRNGKey(2), 0)
    assert (
        type(model).eval_artifacts is not RecModel.eval_artifacts
        or type(model).full_embeddings is not RecModel.full_embeddings
    ), f"{name} should support cached eval"
    users = jnp.arange(min(8, model.n_users))
    direct = model.scores(params, state, users)
    arts = model.eval_artifacts(params, state)
    cached = model.scores_cached(params, state, users, arts)
    np.testing.assert_allclose(
        np.asarray(direct), np.asarray(cached), rtol=1e-5, atol=1e-5
    )
