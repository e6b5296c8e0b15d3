"""GenRec-V1 tests: flip-diffusion semantics + end-to-end 3-phase training."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_flip_schedules_monotone():
    import jax.numpy as jnp

    from genmmrec_tpu.models.diffusion import flip as flipd

    x = jnp.zeros((8, 100)).at[:, :5].set(1.0)  # 95% sparse
    g, e = flipd.flip_schedules(x, 5)
    g, e = np.asarray(g), np.asarray(e)
    assert (np.diff(g) > 0).all() and (np.diff(e) > 0).all()  # cumulative
    assert g[-1] < 0.2 and e[-1] < 0.05


def test_flip_q_sample_flip_rates():
    """Zeros flip to ones at ~sigmoid(gamma-u) rate; ones rarely flip."""
    import jax
    import jax.numpy as jnp

    from genmmrec_tpu.models.diffusion import flip as flipd

    x = jnp.zeros((64, 500)).at[:, :25].set(1.0)
    t = jnp.full((64,), 4, jnp.int32)
    xt = flipd.q_sample(jax.random.PRNGKey(0), x, t, 5)
    x_np, xt_np = np.asarray(x), np.asarray(xt)
    flipped_01 = ((x_np == 0) & (xt_np == 1)).mean()
    flipped_10 = ((x_np == 1) & (xt_np == 0)).mean()
    assert 0.1 < flipped_01 < 0.9  # substantial corruption of zeros
    assert flipped_10 < flipped_01  # ones flip less (epsilon << gamma)


def test_flip_p_sample_binary_output():
    import jax
    import jax.numpy as jnp

    from genmmrec_tpu.models.diffusion import flip as flipd

    x = jnp.zeros((4, 50)).at[:, :5].set(1.0)
    out, probs = flipd.p_sample(
        jax.random.PRNGKey(0), lambda xx, tt: xx * 4 - 2, x, steps=5, q_steps=5
    )
    vals = np.unique(np.asarray(out))
    assert set(vals.tolist()) <= {0.0, 1.0}
    assert np.asarray(probs).min() >= 0 and np.asarray(probs).max() <= 1


def test_interest_debias_vectorized():
    import jax
    import jax.numpy as jnp

    from genmmrec_tpu.common.interest_cluster import build_debias_tables, interest_debias

    # 4 users, 6 items, 2 clusters: items 0-2 cluster 0, items 3-5 cluster 1
    labels = np.array([0, 0, 0, 1, 1, 1])
    train_u = np.array([0, 0, 1])
    train_i = np.array([0, 1, 3])  # user0 -> cluster0 only; user1 -> cluster1 only
    tables = build_debias_tables(train_u, train_i, 4, labels, labels)

    origin = jnp.zeros((2, 6)).at[0, 0].set(1).at[0, 1].set(1).at[1, 3].set(1)
    gen = origin.at[0, 5].set(1).at[1, 2].set(1)  # 0->1 flips outside interest
    users = jnp.array([0, 1])
    out = interest_debias(
        jax.random.PRNGKey(0), users, origin, gen, tables, sample_ratio=1.0
    )
    out = np.asarray(out)
    # user0's flip to item5 (cluster1, not in interest) suppressed
    assert out[0, 5] == 0
    # user1's flip to item2 (cluster0, not in interest) suppressed
    assert out[1, 2] == 0
    # originals preserved
    assert out[0, 0] == 1 and out[1, 3] == 1


def test_genrecv1_end_to_end():
    from genmmrec_tpu.config import Config
    from genmmrec_tpu.data.arrays import build_eval_data, build_train_data
    from genmmrec_tpu.data.dataset import RecDataset
    from genmmrec_tpu.engine.trainer import get_trainer
    from genmmrec_tpu.models import get_model

    config = Config(
        "GenRecV1",
        "tiny",
        {"epochs": 2, "save_recommended_topk": False, "stopping_step": 50},
    )
    ds = RecDataset(config)
    train_ds, valid_ds, _ = ds.split()
    td = build_train_data(train_ds)
    vd = build_eval_data(valid_ds, train_ds, int(config["eval_batch_size"]))

    model = get_model("GenRecV1")(config, td)
    trainer_cls = get_trainer("GenRecV1")
    assert trainer_cls.__name__ == "GenRecV1Trainer"
    trainer = trainer_cls(config, model)
    best, valid, _ = trainer.fit(td, vd, vd, saved=False, verbose=False)

    losses = [trainer.train_loss_dict[e] for e in sorted(trainer.train_loss_dict)]
    assert all(np.isfinite(l) for l in losses)
    assert "recall@20" in valid
    g = trainer._state["image_ui"]
    assert g["rows"].shape[0] == 2 * td.n_users * model.rebuild_k + td.n_users + td.n_items
