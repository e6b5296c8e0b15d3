"""Initializer distribution tests.

The torch-default nn.Linear bias — uniform(±1/sqrt(fan_in)), NOT zero — is
load-bearing for several reference models (SLMRec/DualGNN/BM3): a shared
bias propagated through the normalized UI adjacency creates the init-time
popularity prior that sets their early/best validation scores
(docs/ROUND3.md). These tests pin our initializers to torch semantics so a
future "cleanup" to zero biases can't silently regress the parity story.
"""

import math

import jax
import numpy as np
import pytest

from genmmrec_tpu.common.init import (
    kaiming_uniform_default,
    linear_params,
    xavier_normal,
    xavier_uniform,
)


def test_xavier_uniform_bounds():
    w = np.asarray(xavier_uniform(jax.random.PRNGKey(0), (64, 4096)))
    a = math.sqrt(6.0 / (64 + 4096))
    assert np.abs(w).max() <= a
    assert np.abs(w).max() > 0.9 * a  # actually fills the range
    assert abs(w.mean()) < 0.1 * a


def test_xavier_normal_std():
    w = np.asarray(xavier_normal(jax.random.PRNGKey(0), (256, 256)))
    std = math.sqrt(2.0 / 512)
    assert abs(w.std() - std) / std < 0.05


def test_kaiming_uniform_default_bounds():
    w = np.asarray(kaiming_uniform_default(jax.random.PRNGKey(0), (64, 100)))
    bound = 1.0 / math.sqrt(100)
    assert np.abs(w).max() <= bound
    assert np.abs(w).max() > 0.9 * bound


def test_linear_params_torch_default_bias():
    p = linear_params(jax.random.PRNGKey(0), 4096, 64, init=xavier_uniform)
    b = np.asarray(p["b"])
    bound = 1.0 / math.sqrt(4096)
    assert b.shape == (64,)
    # torch default: uniform(±1/sqrt(fan_in)) — nonzero, inside the bound
    assert np.abs(b).max() <= bound
    assert np.abs(b).max() > 0.5 * bound
    assert not np.allclose(b, 0.0)
    # weight stored (out, in) for x @ W.T
    assert p["w"].shape == (64, 4096)


def test_linear_params_zero_bias_opt_out():
    p = linear_params(jax.random.PRNGKey(0), 32, 16, zero_bias=True)
    assert np.allclose(np.asarray(p["b"]), 0.0)


@pytest.mark.slow
def test_slmrec_dense_bias_nonzero(tmp_path):
    """Regression guard for the coin-flip mechanism carrier: SLMRec's
    v_dense/t_dense biases must follow torch defaults (reference
    slmrec.py:395-401 xavier-inits only the weights)."""
    from genmmrec_tpu.config import Config
    from genmmrec_tpu.data.arrays import build_train_data
    from genmmrec_tpu.data.dataset import RecDataset
    from genmmrec_tpu.models import get_model

    config = Config("SLMRec", "tiny", {"save_recommended_topk": False})
    ds = RecDataset(config)
    train_ds, _, _ = ds.split()
    model = get_model("SLMRec")(config, build_train_data(train_ds))
    params = model.init_params(jax.random.PRNGKey(0))
    for name in ("v_dense", "t_dense", "user_after", "item_after"):
        b = np.asarray(params[name]["b"])
        fan_in = params[name]["w"].shape[1]
        assert not np.allclose(b, 0.0), f"{name} bias zeroed"
        assert np.abs(b).max() <= 1.0 / math.sqrt(fan_in) + 1e-9
