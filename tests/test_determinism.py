"""Reproducibility: identical seeds give identical training trajectories
(SURVEY §4.3 — the reference controls this via init_seed + pretrain_setup;
here everything flows from one PRNGKey(seed))."""

import jax
import numpy as np

from genmmrec_tpu.config import Config
from genmmrec_tpu.data.arrays import build_eval_data, build_train_data
from genmmrec_tpu.data.dataset import RecDataset
from genmmrec_tpu.engine.trainer import Trainer
from genmmrec_tpu.models import get_model


def _run(seed):
    config = Config(
        "BPR", "tiny",
        {"save_recommended_topk": False, "epochs": 2, "seed": seed, "stopping_step": 50},
    )
    ds = RecDataset(config)
    train_ds, valid_ds, _ = ds.split()
    td = build_train_data(train_ds)
    vd = build_eval_data(valid_ds, train_ds, int(config["eval_batch_size"]))
    model = get_model("BPR")(config, td)
    trainer = Trainer(config, model)
    score, valid_res, _ = trainer.fit(td, vd, None, saved=False, verbose=False)
    return score, valid_res, trainer.train_loss_dict


def test_same_seed_same_trajectory():
    s1 = _run(999)
    s2 = _run(999)
    assert s1[0] == s2[0]
    assert s1[1] == s2[1]
    assert s1[2] == s2[2]


def test_different_seed_differs():
    s1 = _run(999)
    s3 = _run(7)
    # loss trajectories must differ (different init + batch order)
    assert s1[2] != s3[2]
