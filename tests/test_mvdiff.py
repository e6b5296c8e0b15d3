import pytest

pytestmark = pytest.mark.slow
def test_mvdiff_end_to_end():
    import numpy as np
    from genmmrec_tpu.config import Config
    from genmmrec_tpu.data.arrays import build_eval_data, build_train_data
    from genmmrec_tpu.data.dataset import RecDataset
    from genmmrec_tpu.engine.trainer import get_trainer
    from genmmrec_tpu.models import get_model

    config = Config("MVDiff", "tiny", {"epochs": 2, "save_recommended_topk": False, "stopping_step": 50})
    ds = RecDataset(config)
    train_ds, valid_ds, _ = ds.split()
    td = build_train_data(train_ds)
    vd = build_eval_data(valid_ds, train_ds, int(config["eval_batch_size"]))
    model = get_model("MVDiff")(config, td)
    trainer_cls = get_trainer("MVDiff")
    assert trainer_cls.__name__ == "MVDiffTrainer"
    trainer = trainer_cls(config, model)
    best, valid, _ = trainer.fit(td, vd, vd, saved=False, verbose=False)
    assert "recall@20" in valid
    assert all(np.isfinite(v) for v in trainer.train_loss_dict.values())
