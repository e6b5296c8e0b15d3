"""Evaluation path equivalence: the dense precomputed mask (fast path) and
the per-chunk scatter mask must produce identical top-k, and the
data-sharded eval (8 virtual devices) must match too."""

import jax
import numpy as np

from genmmrec_tpu.config import Config
from genmmrec_tpu.data.arrays import build_eval_data, build_train_data
from genmmrec_tpu.data.dataset import RecDataset
from genmmrec_tpu.engine.trainer import Trainer
from genmmrec_tpu.models import get_model


def test_dense_mask_matches_scatter_mask():
    config = Config("BPR", "tiny", {"save_recommended_topk": False})
    ds = RecDataset(config)
    train_ds, valid_ds, _ = ds.split()
    td = build_train_data(train_ds)
    vd = build_eval_data(valid_ds, train_ds, int(config["eval_batch_size"]))
    model = get_model("BPR")(config, td)
    trainer = Trainer(config, model)
    params = model.init_params(jax.random.PRNGKey(0))
    trainer._state = model.init_state(jax.random.PRNGKey(1))
    eval_fn = trainer._build_eval_fn()
    n_chunks = vd.users.shape[0] // trainer.eval_batch_size

    topk_scatter = eval_fn(
        params, trainer._state, vd.users, vd.mask_items, n_chunks, dense_mask=False
    )
    dense = trainer._dense_mask(vd)
    assert dense is not None
    topk_dense = eval_fn(
        params, trainer._state, vd.users, dense, n_chunks, dense_mask=True
    )
    np.testing.assert_array_equal(np.asarray(topk_scatter), np.asarray(topk_dense))

    # sharded inputs (8 virtual CPU devices) produce the same top-k
    users_sh, dense_sh = trainer._shard_eval_inputs(vd.users, dense)
    topk_sharded = eval_fn(
        params, trainer._state, users_sh, dense_sh, n_chunks, dense_mask=True
    )
    np.testing.assert_array_equal(np.asarray(topk_dense), np.asarray(topk_sharded))


def test_bf16_eval_dtype_matches_f32_metrics():
    """The bf16 scoring path (models/base.py scores_cached) must reproduce
    the f32 evaluation metrics on a well-separated tiny problem — bf16 only
    reorders near-ties, so with distinct random embeddings the top-k sets
    should agree to within a tight metric tolerance."""

    results = {}
    for dtype in ("float32", "bfloat16"):
        config = Config(
            "BPR", "tiny", {"save_recommended_topk": False, "eval_dtype": dtype}
        )
        ds = RecDataset(config)
        train_ds, valid_ds, _ = ds.split()
        td = build_train_data(train_ds)
        vd = build_eval_data(valid_ds, train_ds, int(config["eval_batch_size"]))
        model = get_model("BPR")(config, td)
        trainer = Trainer(config, model)
        params = model.init_params(jax.random.PRNGKey(0))
        trainer._state = model.init_state(jax.random.PRNGKey(1))
        results[dtype] = trainer.evaluate(params, vd)

    f32, bf16 = results["float32"], results["bfloat16"]
    for k in ("recall@20", "ndcg@20"):
        assert abs(f32[k] - bf16[k]) < 5e-3, (k, f32[k], bf16[k])
