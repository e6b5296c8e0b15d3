"""Run orchestration: config merge → data → grid-search loop → train/eval.

Parity with reference ``quick_start`` (`src/utils/quick_start.py:26-223`):
config assembly, dataset load/split logging, popular-item (top-20% by train
count) and warm-user (>5 train interactions) analyses, hyper-parameter grid
loop with per-run seeding, best-result tracking across the grid, and the
final summary block.

TPU-native deltas: datasets become device-resident ``TrainData``/``EvalData``
once, shared across all grid runs; pop/warm groups are boolean device masks
(not Python sets).
"""

from __future__ import annotations

import os
import platform
from logging import getLogger

import jax.numpy as jnp
import numpy as np

from genmmrec_tpu.config import Config
from genmmrec_tpu.data.arrays import build_eval_data, build_train_data
from genmmrec_tpu.data.dataset import RecDataset
from genmmrec_tpu.engine.trainer import get_trainer
from genmmrec_tpu.models import get_model
from genmmrec_tpu.utils.logger import init_logger
from genmmrec_tpu.utils.misc import dict2str, init_seed


def enable_compilation_cache():
    """Persistent XLA compilation cache across runs (VERDICT r3 #6: per-run
    first-compile latency made cheap models slower end-to-end than
    torch-CPU). Safe no-op where the backend doesn't support it."""
    import jax

    if os.environ.get("GENMMREC_NO_CACHE") or "cpu" in os.environ.get(
        "JAX_PLATFORMS", ""
    ):
        # XLA:CPU AOT entries bake host machine features; this VM's CPU
        # microarch changes across resets (SIGILL risk on stale entries).
        # CPU compiles are fast — skip the persistent cache on CPU.
        return
    try:
        cache_dir = os.environ.get(
            "GENMMREC_JAX_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "genmmrec_jax"),
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    except Exception as e:  # unsupported backend/flag drift: run uncached
        getLogger().info("compilation cache unavailable: %s", e)


def _wandb_init_for_combo(config, names, combo, logger):
    """Per-combo wandb run init (reference `quick_start.py:137-169`): run
    name ``model_ds_seed<seed>[_k<v>...]``, serializable config snapshot,
    tags, reinit per combo. Returns the run or None."""
    if not bool(config["use_wandb"]):
        return None
    try:
        import wandb
    except ImportError:
        return None
    run_name = f"{config['model']}_{config['dataset']}_seed{config['seed']}"
    if len(combo) > 1:
        run_name += "_" + "_".join(
            f"{k}{v}" for k, v in zip(names[1:], combo[1:])
        )
    wandb_config = {}
    for k, v in config.final_config_dict.items():
        if callable(v):
            continue
        try:
            import json

            json.dumps(v)
            wandb_config[k] = v
        except (TypeError, ValueError):
            wandb_config[k] = str(v)
    project = config["wandb_project"] or "GenMMRec"
    run = wandb.init(
        project=str(project),
        name=run_name,
        config=wandb_config,
        reinit=True,
        tags=[str(config["model"]), str(config["dataset"])],
        notes=f"Training {config['model']} on {config['dataset']}",
    )
    logger.info("W&B run initialized: %s", run_name)
    return run


def quick_start(model, dataset, config_dict=None, save_model=True, mg=False, max_epochs=None):
    enable_compilation_cache()
    config = Config(model, dataset, config_dict, mg)
    if max_epochs is not None:
        config["epochs"] = max_epochs
    init_logger(config)
    logger = getLogger()
    logger.info("██Server: \t" + platform.node())
    logger.info("██Dir: \t" + os.getcwd() + "\n")
    logger.info(config)

    ds = RecDataset(config)
    logger.info(str(ds))
    train_ds, valid_ds, test_ds = ds.split()
    logger.info("\n====Training====\n" + str(train_ds))
    logger.info("\n====Validation====\n" + str(valid_ds))
    logger.info("\n====Testing====\n" + str(test_ds))

    # popular-item analysis: top 20% of unique train items by count
    item_counts = np.bincount(train_ds.table.items, minlength=ds.item_num)
    unique_items = np.argsort(-item_counts, kind="stable")
    unique_items = unique_items[item_counts[unique_items] > 0]
    num_pop = int(len(unique_items) * 0.2)
    pop_mask = np.zeros(ds.item_num, bool)
    pop_mask[unique_items[:num_pop]] = True
    config["pop_items"] = set(unique_items[:num_pop].tolist())
    config["pop_mask"] = jnp.asarray(pop_mask)
    logger.info(
        f"Train dataset All Interaction items count: {len(unique_items)}, "
        f"Popular items count: {num_pop}, "
        f"Niche items count: {len(unique_items) - num_pop}"
    )

    # warm-user analysis: users with >5 train interactions
    user_counts = np.bincount(train_ds.table.users, minlength=ds.user_num)
    warm_mask = user_counts > 5
    config["warm_users"] = set(np.nonzero(warm_mask)[0].tolist())
    config["warm_mask"] = jnp.asarray(warm_mask)
    n_active = int((user_counts > 0).sum())
    logger.info("User Grouping based on Training History (Threshold=5):")
    logger.info(f"  Warm Users (>5 interactions): {int(warm_mask.sum())}")
    logger.info(
        f"  Cold Users (<=5 interactions): {n_active - int(warm_mask.sum())} (in training set)"
    )

    train_data = build_train_data(train_ds)
    eval_bs = int(config["eval_batch_size"])
    valid_data = build_eval_data(valid_ds, train_ds, eval_bs)
    test_data = build_eval_data(test_ds, train_ds, eval_bs)

    logger.info("\n\n=================================\n\n")

    hyper_ret = []
    best_test_value = 0.0
    idx = best_test_idx = 0
    val_metric = str(config["valid_metric"]).lower()

    combos = list(config.hyper_grid())
    total = len(combos)
    for names, combo in combos:
        for name, value in zip(names, combo):
            config[name] = value
        init_seed(int(config["seed"]))
        logger.info(
            "========={}/{}: Parameters:{}={}=======".format(
                idx + 1, total, names, combo
            )
        )

        # per-combo wandb run lifecycle (reference quick_start.py:137-199):
        # a fresh named run per hyper-combo, final metrics + summary, finish
        wandb_run = _wandb_init_for_combo(config, names, combo, logger)

        model_cls = get_model(config["model"])
        model_obj = model_cls(config, train_data)
        trainer = get_trainer(config["model"])(config, model_obj, mg)
        best_valid_score, best_valid_result, best_test_upon_valid = trainer.fit(
            train_data, valid_data, test_data, saved=save_model
        )
        hyper_ret.append((combo, best_valid_result, best_test_upon_valid))

        if wandb_run is not None:
            import wandb

            wandb.log({
                "best_valid_score": best_valid_score,
                **{f"valid/{k}": v for k, v in best_valid_result.items()},
                **{f"test/{k}": v for k, v in best_test_upon_valid.items()},
            })
            wandb.run.summary.update({
                "best_valid_score": best_valid_score,
                **{f"final_valid_{k}": v for k, v in best_valid_result.items()},
                **{f"final_test_{k}": v for k, v in best_test_upon_valid.items()},
            })
            wandb.finish()

        if best_test_upon_valid.get(val_metric, 0.0) > best_test_value:
            best_test_value = best_test_upon_valid.get(val_metric, 0.0)
            best_test_idx = idx
        idx += 1

        logger.info("best valid result: {}".format(dict2str(best_valid_result)))
        logger.info("test result: {}".format(dict2str(best_test_upon_valid)))
        logger.info(
            "████Current BEST████:\nParameters: {}={},\n"
            "Valid: {},\nTest: {}\n\n\n".format(
                names,
                hyper_ret[best_test_idx][0],
                dict2str(hyper_ret[best_test_idx][1]),
                dict2str(hyper_ret[best_test_idx][2]),
            )
        )

    logger.info("\n============All Over=====================")
    for p, best_valid, best_test in hyper_ret:
        logger.info(
            "Parameters: {}={},\n best valid: {},\n best test: {}".format(
                names, p, dict2str(best_valid), dict2str(best_test)
            )
        )
    logger.info("\n\n█████████████ BEST ████████████████")
    logger.info(
        "\tParameters: {}={},\nValid: {},\nTest: {}\n\n".format(
            names,
            hyper_ret[best_test_idx][0],
            dict2str(hyper_ret[best_test_idx][1]),
            dict2str(hyper_ret[best_test_idx][2]),
        )
    )
    return hyper_ret[best_test_idx]
