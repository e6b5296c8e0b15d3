"""SLMRec SSL tasks: FM (random modality masking) must be a distinct task
from FD (dropout twins) — VERDICT r3 missing-item #1. Reference semantics:
`src/models/slmrec.py:192-267` (feature_masking), :120-190 (feature_dropout),
:345-352 (task dispatch, FD+FM = masking with per-layer dropout).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def slmrec_setup():
    from genmmrec_tpu.config import Config
    from genmmrec_tpu.data.arrays import build_train_data
    from genmmrec_tpu.data.dataset import RecDataset
    from genmmrec_tpu.models import get_model

    config = Config("SLMRec", "tiny", {"save_recommended_topk": False})
    ds = RecDataset(config)
    train_ds, _, _ = ds.split()
    td = build_train_data(train_ds)
    model = get_model("SLMRec")(config, td)
    params = model.init_params(jax.random.PRNGKey(0))
    batch = {
        "users": jnp.asarray(np.arange(8) % model.n_users),
        "pos": jnp.asarray(np.arange(8) % model.n_items),
        "neg": jnp.zeros(8, jnp.int32),
        "weight": jnp.ones(8, jnp.float32),
    }
    return model, params, batch


def _ssl_for_task(model, params, batch, task, key):
    model.ssl_task = task
    model.compute(params)  # populate tower caches like loss() does
    u, p, w = batch["users"], batch["pos"], batch["weight"]
    if task == "FM":
        return model._fm(params, key, u, p, w, use_dropout=False)
    if task == "FD+FM":
        return model._fm(params, key, u, p, w, use_dropout=True)
    if task == "FD":
        return model._fd(params, key, u, p, w)
    return model._fac(params, p, w)


def test_fm_runs_and_differs_from_fd(slmrec_setup):
    model, params, batch = slmrec_setup
    key = jax.random.PRNGKey(42)
    losses = {
        t: float(_ssl_for_task(model, params, batch, t, key))
        for t in ("FM", "FD", "FD+FM")
    }
    for t, v in losses.items():
        assert np.isfinite(v), f"{t} loss not finite"
    # same key, different tasks -> different computation graphs/values
    assert losses["FM"] != pytest.approx(losses["FD"], rel=1e-6)
    assert losses["FM"] != pytest.approx(losses["FD+FM"], rel=1e-6)


def test_fm_masks_exactly_two_distinct_modalities(slmrec_setup):
    """The FM view-selection draw yields two DISTINCT modality indices for
    every key (reference slmrec.py:200-204: random.sample of 2 without
    replacement), covering all ordered pairs; plus per-key determinism of
    the resulting loss."""
    model, params, batch = slmrec_setup
    u, p, w = batch["users"], batch["pos"], batch["weight"]
    R = 3  # [id, v, t] towers on this dataset
    draws = [
        tuple(
            int(x)
            for x in jax.device_get(model._fm_draw(jax.random.PRNGKey(s), R))
        )
        for s in range(200)
    ]
    assert all(a != b for a, b in draws), "FM drew a repeated modality"
    assert all(0 <= a < R and 0 <= b < R for a, b in draws)
    # 200 draws over 6 ordered pairs: all pairs reachable
    assert len(set(draws)) == R * (R - 1)

    model.compute(params)
    l1 = float(model._fm(params, jax.random.PRNGKey(1), u, p, w, False))
    l1_again = float(model._fm(params, jax.random.PRNGKey(1), u, p, w, False))
    l2 = float(model._fm(params, jax.random.PRNGKey(2), u, p, w, False))
    assert l1 == pytest.approx(l1_again)  # deterministic per key
    assert np.isfinite(l2)


def test_fm_end_to_end_loss(slmrec_setup):
    """ssl_task: FM runs through the full loss() path (VERDICT done-bar)."""
    model, params, batch = slmrec_setup
    model.ssl_task = "FM"
    total, _ = model.loss(params, {}, batch, jax.random.PRNGKey(7))
    assert np.isfinite(float(total))
    model.ssl_task = "FAC"  # restore for other tests sharing the fixture
