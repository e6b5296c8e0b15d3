"""End-to-end smoke: BPR on the tiny synthetic dataset.

Pins the framework contract the reference's verify_*.py scripts pin
(config keys → data → train → eval → metric dict), plus actual-learning
assertions the reference lacks.
"""

import numpy as np


def test_bpr_end_to_end(tmp_path, tiny_splits):
    from genmmrec_tpu.config import Config
    from genmmrec_tpu.data.arrays import build_eval_data, build_train_data
    from genmmrec_tpu.engine.trainer import Trainer
    from genmmrec_tpu.models import get_model

    config, ds, train_ds, valid_ds, test_ds = tiny_splits
    config = Config(
        "BPR",
        "tiny",
        {
            "epochs": 30,
            "save_recommended_topk": False,
            "checkpoint_dir": str(tmp_path / "saved"),
            "stopping_step": 50,
        },
    )
    train_data = build_train_data(train_ds)
    valid_data = build_eval_data(valid_ds, train_ds, int(config["eval_batch_size"]))
    test_data = build_eval_data(test_ds, train_ds, int(config["eval_batch_size"]))

    model = get_model("BPR")(config, train_data)
    trainer = Trainer(config, model)
    best_score, best_valid, best_test = trainer.fit(
        train_data, valid_data, test_data, saved=True, verbose=False
    )

    # metric dict shape
    for m in ("recall", "ndcg", "precision", "map"):
        for k in (5, 10, 20, 50):
            assert f"{m}@{k}" in best_valid
    # learning happened: loss decreased
    losses = [trainer.train_loss_dict[e] for e in sorted(trainer.train_loss_dict)]
    assert losses[-1] < losses[0]
    # scores are sane
    assert 0.0 <= best_score <= 1.0
    # on 48 items with k=50, recall@50 must be 1 (entire catalog recommended)
    assert best_valid["recall@50"] == 1.0
    # checkpoint written
    import os

    assert os.path.exists(os.path.join(str(tmp_path / "saved"), "BPR-tiny.ckpt"))


def test_negative_sampling_avoids_history(tiny_splits):
    import jax

    from genmmrec_tpu.data.arrays import build_train_data, sample_negatives

    _, ds, train_ds, _, _ = tiny_splits
    td = build_train_data(train_ds)
    users = td.users[:64]
    neg = sample_negatives(
        jax.random.PRNGKey(0), users, td.hist, td.item_pool, td.n_pool
    )
    hist = np.asarray(td.hist)
    users_np, neg_np = np.asarray(users), np.asarray(neg)
    for u, n in zip(users_np, neg_np):
        assert n not in hist[u][hist[u] < td.n_items]


def test_eval_masking_excludes_train_items(tiny_splits):
    """Recommended items must never include the user's train positives."""
    import jax

    from genmmrec_tpu.config import Config
    from genmmrec_tpu.data.arrays import build_eval_data, build_train_data
    from genmmrec_tpu.engine.trainer import Trainer
    from genmmrec_tpu.models import get_model

    config, ds, train_ds, valid_ds, _ = tiny_splits
    config = Config("BPR", "tiny", {"save_recommended_topk": False})
    td = build_train_data(train_ds)
    ed = build_eval_data(valid_ds, train_ds, int(config["eval_batch_size"]))
    model = get_model("BPR")(config, td)
    trainer = Trainer(config, model)
    params = model.init_params(jax.random.PRNGKey(0))
    trainer._state = model.init_state(jax.random.PRNGKey(1))
    fn = trainer._build_eval_fn()
    topk = np.asarray(
        fn(params, trainer._state, ed.users, ed.mask_items, ed.users.shape[0] // int(config["eval_batch_size"]))
    )
    mask = np.asarray(ed.mask_items)
    valid = np.asarray(ed.valid)
    k_check = min(topk.shape[1], td.n_items - int(np.max(np.asarray(ed.mask_len))))
    for row in range(len(topk)):
        if not valid[row]:
            continue
        train_items = set(mask[row][mask[row] < td.n_items].tolist())
        assert not train_items & set(topk[row][:k_check].tolist())


def test_checkpoint_resume(tiny_splits, tmp_path):
    """Save at epoch k, resume in a fresh trainer, and continue to the same
    final epoch count (the reference saves but never wires resume)."""
    from genmmrec_tpu.config import Config
    from genmmrec_tpu.data.arrays import build_eval_data, build_train_data
    from genmmrec_tpu.engine.trainer import Trainer
    from genmmrec_tpu.models import get_model

    _, ds, train_ds, valid_ds, test_ds = tiny_splits
    base = {
        "save_recommended_topk": False,
        "checkpoint_dir": str(tmp_path / "saved"),
        "stopping_step": 50,
        "epochs": 2,
    }
    config = Config("BPR", "tiny", base)
    train_data = build_train_data(train_ds)
    valid_data = build_eval_data(valid_ds, train_ds, int(config["eval_batch_size"]))
    model = get_model("BPR")(config, train_data)
    trainer = Trainer(config, model)
    trainer.fit(train_data, valid_data, None, saved=True, verbose=False)
    ckpt = str(tmp_path / "saved" / "BPR-tiny")

    config2 = Config(
        "BPR", "tiny", {**base, "epochs": 4, "resume_checkpoint": ckpt}
    )
    model2 = get_model("BPR")(config2, train_data)
    trainer2 = Trainer(config2, model2)
    score, valid_res, _ = trainer2.fit(train_data, valid_data, None, saved=False, verbose=False)
    assert trainer2.start_epoch >= 1  # resumed past the saved epoch
    assert "recall@20" in valid_res


def test_mirror_gradient_training(tiny_splits):
    """The mg two-pass trick (reference `src/common/trainer.py:180-197`)
    trains and evaluates end-to-end."""
    import jax

    from genmmrec_tpu.config import Config
    from genmmrec_tpu.data.arrays import build_eval_data, build_train_data
    from genmmrec_tpu.engine.trainer import Trainer
    from genmmrec_tpu.models import get_model

    config = Config(
        "BPR", "tiny",
        {"save_recommended_topk": False, "epochs": 2, "alpha1": 1.0,
         "alpha2": 0.3, "beta": 2},
    )
    _, ds, train, valid, _ = tiny_splits
    td = build_train_data(train)
    vd = build_eval_data(valid, train, int(config["eval_batch_size"]))
    model = get_model("BPR")(config, td)
    trainer = Trainer(config, model, mg=True)
    score, result, _ = trainer.fit(td, vd, None, saved=False, verbose=False)
    assert 0.0 <= score <= 1.0
    assert all(v == v for v in result.values())  # no NaNs
