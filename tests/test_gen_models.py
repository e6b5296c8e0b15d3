"""Contract smoke tests for the generative model family (DDRM, MCDRec) and
short training runs."""

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny_td():
    from genmmrec_tpu.config import Config
    from genmmrec_tpu.data.arrays import build_train_data
    from genmmrec_tpu.data.dataset import RecDataset

    config = Config("BPR", "tiny", {"save_recommended_topk": False})
    ds = RecDataset(config)
    train_ds, valid_ds, _ = ds.split()
    return train_ds, valid_ds, build_train_data(train_ds)


@pytest.mark.parametrize(
    "name", ["DDRM", "MCDRec", "LD4MRec", "DiffGraph", "GenRecBM3", "CoDMR"]
)
def test_gen_model_contract(tiny_td, name):
    from genmmrec_tpu.config import Config
    from genmmrec_tpu.models import get_model

    _, _, td = tiny_td
    config = Config(name, "tiny", {"save_recommended_topk": False})
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
    total, _ = model.loss(params, state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(total))
    grads = jax.grad(lambda p: model.loss(p, state, batch, jax.random.PRNGKey(2))[0])(params)
    gnorm = sum(float((g**2).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0
    scores = model.scores(params, state, td.users[:4])
    assert scores.shape == (4, td.n_items)
    assert np.isfinite(np.asarray(scores)).all()


def test_mcdrec_dgd_keeps_expected_edges(tiny_td):
    from genmmrec_tpu.config import Config
    from genmmrec_tpu.models import get_model

    _, _, td = tiny_td
    config = Config("MCDRec", "tiny", {"save_recommended_topk": False, "steps": 5})
    model = get_model("MCDRec")(config, td)
    key = jax.random.PRNGKey(0)
    params = model.init_params(key)
    state = model.pre_epoch(params, model.init_state(key), jax.random.PRNGKey(1), 0)
    vals = np.asarray(state["graph_vals"])
    nonzero_pairs = (vals != 0).sum() // 2  # symmetric halves
    n_keep = max(1, int(model.n_edges * (1 - model.rho)))
    # dropped edges zeroed: kept count <= n_keep (dups may share value rows)
    assert nonzero_pairs <= model.n_edges
    assert nonzero_pairs >= n_keep * 0.5


def test_ddrm_training_run(tiny_td):
    from genmmrec_tpu.config import Config
    from genmmrec_tpu.data.arrays import build_eval_data
    from genmmrec_tpu.engine.trainer import Trainer
    from genmmrec_tpu.models import get_model

    train_ds, valid_ds, td = tiny_td
    config = Config(
        "DDRM", "tiny", {"epochs": 2, "save_recommended_topk": False, "stopping_step": 50}
    )
    vd = build_eval_data(valid_ds, train_ds, int(config["eval_batch_size"]))
    model = get_model("DDRM")(config, td)
    trainer = Trainer(config, model)
    _, valid, _ = trainer.fit(td, vd, vd, saved=False, verbose=False)
    assert "recall@20" in valid
    assert all(np.isfinite(v) for v in trainer.train_loss_dict.values())
