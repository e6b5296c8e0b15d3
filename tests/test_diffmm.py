"""DiffMM end-to-end: 3-phase trainer (denoiser training, graph
regeneration, BPR/CL epoch) on the tiny synthetic dataset."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_diffmm_end_to_end():
    from genmmrec_tpu.config import Config
    from genmmrec_tpu.data.arrays import build_eval_data, build_train_data
    from genmmrec_tpu.data.dataset import RecDataset
    from genmmrec_tpu.engine.trainer import get_trainer
    from genmmrec_tpu.models import get_model

    config = Config(
        "DiffMM",
        "tiny",
        {"epochs": 2, "save_recommended_topk": False, "stopping_step": 50},
    )
    ds = RecDataset(config)
    train_ds, valid_ds, test_ds = ds.split()
    td = build_train_data(train_ds)
    vd = build_eval_data(valid_ds, train_ds, int(config["eval_batch_size"]))

    model = get_model("DiffMM")(config, td)
    trainer_cls = get_trainer("DiffMM")
    assert trainer_cls.__name__ == "DiffMMTrainer"
    trainer = trainer_cls(config, model)
    best, valid, _ = trainer.fit(td, vd, vd, saved=False, verbose=False)

    losses = [trainer.train_loss_dict[e] for e in sorted(trainer.train_loss_dict)]
    assert all(np.isfinite(l) for l in losses)
    assert "recall@20" in valid

    # regenerated graphs present with static nnz = 2*U*k + N
    g = trainer._state["image_ui"]
    U, k = td.n_users, model.rebuild_k
    N = td.n_users + td.n_items
    assert g["rows"].shape[0] == 2 * U * k + N
    # graph edges reference valid nodes
    assert int(np.asarray(g["cols"]).max()) < N


def test_diffmm_main_optimizer_freezes_denoisers():
    """BPR-phase updates must not touch the denoiser subtrees."""
    import jax

    from genmmrec_tpu.config import Config
    from genmmrec_tpu.data.arrays import build_train_data
    from genmmrec_tpu.data.dataset import RecDataset
    from genmmrec_tpu.engine.diffusion_trainers import DiffMMTrainer
    from genmmrec_tpu.models import get_model

    config = Config("DiffMM", "tiny", {"save_recommended_topk": False})
    ds = RecDataset(config)
    train_ds, _, _ = ds.split()
    td = build_train_data(train_ds)
    model = get_model("DiffMM")(config, td)
    trainer = DiffMMTrainer(config, model)

    params = model.init_params(jax.random.PRNGKey(0))
    state = model.init_state(jax.random.PRNGKey(1))
    trainer._state = state
    _, train_epoch = trainer._build_train_step(td)
    opt = trainer._make_optimizer()
    opt_state = opt.init(params)
    before = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(), params["denoise_image"])
    new_params, _, _, _ = train_epoch(params, opt_state, state, jax.random.PRNGKey(2))
    after = new_params["denoise_image"]
    for b, a in zip(jax.tree_util.tree_leaves(before), jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
