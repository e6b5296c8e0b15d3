"""Training engine: jit-compiled epoch scans, on-device evaluation, early
stopping, checkpointing.

Capability parity with the reference ``Trainer``
(`src/common/trainer.py:58-408`):
- optimizer selection (adam/sgd/adagrad/rmsprop) + torch-style coupled
  weight decay;
- exponential LR schedule ``lr * s0 ** (epoch / s1)``
  (`src/common/trainer.py:110-113`);
- epoch loop with ``pre_epoch_processing`` / ``post_epoch_processing`` model
  hooks, multi-part loss tuples, NaN abort, optional gradient clipping and
  the "mirror-gradient" (mg) two-pass trick (`src/common/trainer.py:180-197`);
- eval every ``eval_step`` epochs with early stopping on the valid metric,
  test-upon-valid bookkeeping and best-checkpoint saving
  (`src/common/trainer.py:238-343`).

TPU-native deltas:
- an epoch is ONE jitted ``lax.scan`` over statically-shaped batches —
  negative sampling, loss, grads and the optimizer update all fuse into a
  single device program; no per-batch host sync (the reference calls
  ``loss.item()`` every batch, `src/common/trainer.py:171-175`);
- evaluation runs fully on device: sharded full-catalog scoring, scatter
  masking of train positives, ``lax.top_k`` and the jnp metric suite;
- checkpoints include optimizer state and epoch for resume (the reference
  never wires resume, `src/common/trainer.py:97`).
"""

from __future__ import annotations

import os
from functools import partial
from logging import getLogger
from time import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from genmmrec_tpu.data.arrays import EvalData, TrainData, sample_negatives
from genmmrec_tpu.engine.evaluator import TopKEvaluator
from genmmrec_tpu.ops.topk import grouped_topk
from genmmrec_tpu.parallel.mesh import (
    MODEL_AXIS,
    build_mesh,
    data_sharding,
    replicated,
    sharded_topk,
)
from genmmrec_tpu.utils.misc import dict2str, early_stopping, get_local_time


def get_trainer(model_name: Optional[str] = None):
    """Trainer registry (parity with `src/utils/utils.py:44-58`)."""
    from genmmrec_tpu.engine import diffusion_trainers as dt

    mapping = {
        "DiffMM": dt.DiffMMTrainer,
        "GenRecV1": dt.GenRecV1Trainer,
        "MVDiff": dt.MVDiffTrainer,
    }
    return mapping.get(model_name, Trainer)


def _scalar(value, cast=float):
    """Config values may still be hyper-grid lists when the grid was pinned
    (e.g. hyper_parameters: [seed]); take the first entry like the models'
    scalar() helper."""
    if isinstance(value, list):
        value = value[0]
    return cast(value)


class Trainer:
    def __init__(self, config, model, mg: bool = False):
        self.config = config
        self.model = model
        self.logger = getLogger()

        self.learner = str(config["learner"] or "adam")
        self.learning_rate = _scalar(config["learning_rate"])
        self.epochs = int(config["epochs"])
        self.eval_step = min(int(config["eval_step"] or 1), self.epochs)
        self.stopping_step = int(config["stopping_step"])
        self.clip_grad_norm = config["clip_grad_norm"]
        self.valid_metric = str(config["valid_metric"]).lower()
        self.valid_metric_bigger = bool(config["valid_metric_bigger"])
        self.eval_batch_size = int(config["eval_batch_size"])
        self.train_batch_size = int(config["train_batch_size"])
        self.req_training = bool(config["req_training"])
        wd = config["weight_decay"]
        if isinstance(wd, list):
            wd = wd[0]
        # the reference YAML idiom writes decay as strings like "1e-4";
        # float() parses those directly — no eval needed
        self.weight_decay = float(wd) if wd else 0.0
        self.lr_schedule_cfg = config["learning_rate_scheduler"] or [1.0, 50]
        self.neg_rounds = int(config["neg_sample_rounds"] or 8)

        self.mg = mg
        self.alpha1 = float(config["alpha1"] or 1.0) if mg else 1.0
        self.alpha2 = float(config["alpha2"] or 0.0) if mg else 0.0
        self.beta = int(config["beta"] or 1) if mg else 1

        self.start_epoch = 0
        self.cur_step = 0
        init_metrics = {
            f"{m.lower()}@{k}": 0.0
            for m in config["metrics"]
            for k in config["topk"]
        }
        self.best_valid_score = -1.0
        self.best_valid_result = init_metrics
        self.best_test_upon_valid = init_metrics
        self.train_loss_dict = {}
        # wall-clock per training epoch (incl. any diffusion prelude), in
        # fit order — lets harnesses separate steady-state epoch time from
        # the first compile-heavy epoch (reference logs per-epoch time only
        # as text, src/common/trainer.py:230-236)
        self.epoch_times: list[float] = []
        self.evaluator = TopKEvaluator(config)

        try:
            self.mesh = build_mesh(config)
        except (ValueError, RuntimeError) as e:
            self.logger.warning(
                "mesh build failed (%s) — running single-device, no sharding", e
            )
            self.mesh = None
        self.use_wandb = bool(config["use_wandb"])
        self._wandb = None
        if self.use_wandb:
            try:
                import wandb

                self._wandb = wandb if wandb.run is not None else None
            except ImportError:
                self._wandb = None

        # group masks for test-time metrics, set by quick_start
        self.pop_mask = config["pop_mask"]  # (n_items,) bool jnp or None
        self.warm_mask = config["warm_mask"]  # (n_users,) bool jnp or None

        self._train_epoch_fn = None
        self._eval_fn = None
        self._mask_cache = {}
        self._fused_eval = False  # set by _build_eval_fn (fused_form)

    # ------------------------------------------------------------------
    def _make_optimizer(self) -> optax.GradientTransformation:
        steps_per_epoch = max(1, self._num_batches)
        s0, s1 = float(self.lr_schedule_cfg[0]), float(self.lr_schedule_cfg[1])

        def schedule(step):
            epoch = step // steps_per_epoch
            return self.learning_rate * jnp.power(s0, epoch / s1)

        name = self.learner.lower()
        chain = []
        if self.clip_grad_norm:
            max_norm = (
                self.clip_grad_norm.get("max_norm")
                if isinstance(self.clip_grad_norm, dict)
                else float(self.clip_grad_norm)
            )
            chain.append(optax.clip_by_global_norm(float(max_norm)))
        if self.weight_decay:
            # torch-style coupled decay: grad += wd * param, before the
            # optimizer moments (reference builds optim.Adam(weight_decay=..))
            chain.append(optax.add_decayed_weights(self.weight_decay))
        if name == "adam":
            chain.append(optax.scale_by_adam())
        elif name == "sgd":
            pass  # plain SGD: identity before lr scaling
        elif name == "adagrad":
            chain.append(optax.scale_by_rss(initial_accumulator_value=0.0))
        elif name == "rmsprop":
            chain.append(optax.scale_by_rms())
        else:
            self.logger.warning("Unrecognized optimizer %s; using adam", name)
            chain.append(optax.scale_by_adam())
        chain.append(optax.scale_by_schedule(lambda s: -schedule(s)))
        tx = optax.chain(*chain)
        # models with auxiliary sub-optimizers label their params:
        #   'aux' — frozen for the main optimizer (trained in separate
        #           phases, e.g. DiffMM's denoisers);
        #   others — model-provided transforms (e.g. the RF module's
        #           embedded AdamW, reference rf_modules.py:607-611).
        if hasattr(self.model, "param_labels"):
            transforms = {"main": tx, "aux": optax.set_to_zero()}
            if hasattr(self.model, "label_transforms"):
                transforms.update(self.model.label_transforms())
            tx = optax.multi_transform(transforms, self.model.param_labels)
        return tx

    # ------------------------------------------------------------------
    def _build_train_step(self, td: TrainData):
        model = self.model
        B = self.train_batch_size
        n_inter = td.n_inter
        self._num_batches = -(-n_inter // B)
        n_pad = self._num_batches * B
        optimizer = self._make_optimizer()
        mg, alpha1, alpha2, beta = self.mg, self.alpha1, self.alpha2, self.beta
        neg_rounds = self.neg_rounds
        use_neg = bool(self.config["use_neg_sampling"])

        grad_fn = jax.value_and_grad(model.loss_and_update, has_aux=True)

        # multi-chip: batches split over the mesh data axis (params stay
        # replicated unless model-sharded in fit(); XLA inserts the psum
        # over per-shard gradients)
        batch_sharding = None
        if jax.device_count() > 1:
            if self.mesh is None:
                self.logger.warning(
                    "multi-device run but mesh build failed — training "
                    "batches stay single-device (check mesh_shape)"
                )
            elif B % self.mesh.shape["data"] != 0:
                self.logger.warning(
                    "train_batch_size %d not divisible by data axis %d — "
                    "batch sharding DISABLED for this run",
                    B, self.mesh.shape["data"],
                )
            else:
                batch_sharding = data_sharding(self.mesh)

        def batch_step(carry, xs):
            # model.data is the trace-time BOUND TrainData (a jit argument,
            # not a closure constant — see RecModel.buffers)
            td_b = model.data
            params, opt_state, state = carry
            raw_idx, key, batch_i = xs
            k_neg, k_loss, k_loss2 = jax.random.split(key, 3)
            # raw_idx >= n_inter are padding slots: clamp to 0 and weight 0
            weight = (raw_idx < n_inter).astype(jnp.float32)
            idx = raw_idx % n_inter
            users = td_b.users[idx]
            pos = td_b.items[idx]
            if use_neg:
                neg = sample_negatives(
                    k_neg, users, td_b.hist, td_b.item_pool, td_b.n_pool, neg_rounds
                )
            else:  # e.g. BM3 (use_neg_sampling: False) — negatives unused
                neg = jnp.zeros_like(pos)
            batch = {"users": users, "pos": pos, "neg": neg, "weight": weight}
            if batch_sharding is not None:
                batch = {
                    k: jax.lax.with_sharding_constraint(v, batch_sharding)
                    for k, v in batch.items()
                }
            (total, (parts, state)), grads = grad_fn(params, state, batch, k_loss)

            if mg:
                def mirror_branch(operand):
                    params, opt_state, grads = operand
                    # first pass: step with alpha1 * grads
                    g1 = jax.tree_util.tree_map(lambda g: alpha1 * g, grads)
                    upd, new_opt = optimizer.update(g1, opt_state, params)
                    p1 = optax.apply_updates(params, upd)
                    # second pass on the same batch, step with -alpha2 * grads
                    (_, _), g2 = grad_fn(p1, state, batch, k_loss2)
                    g2 = jax.tree_util.tree_map(lambda g: -alpha2 * g, g2)
                    upd2, new_opt2 = optimizer.update(g2, new_opt, p1)
                    return optax.apply_updates(p1, upd2), new_opt2

                def plain_branch(operand):
                    params, opt_state, grads = operand
                    upd, new_opt = optimizer.update(grads, opt_state, params)
                    return optax.apply_updates(params, upd), new_opt

                params, opt_state = jax.lax.cond(
                    batch_i % beta == 0,
                    mirror_branch,
                    plain_branch,
                    (params, opt_state, grads),
                )
            else:
                upd, new_opt = optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, upd)
                opt_state = new_opt

            parts = jnp.stack([p for p in parts])
            return (params, opt_state, state), parts

        num_batches = self._num_batches
        # Epoch slicing: cap the number of batches per device program. A
        # full-epoch scan is ONE XLA program execution; for models that
        # propagate the whole graph every batch (DiffMM at elec scale:
        # ~1.6k batches x ~8 SpMMs over 255k nodes) that single program runs
        # for upwards of an hour, long enough for the TPU-runtime RPC to
        # declare the worker dead ("TPU worker process crashed or
        # restarted"). Slices of S batches keep each program bounded while
        # the epoch semantics stay identical (same permutation, same keys,
        # padding slots carry weight 0 either way). 0 = single scan.
        S = int(self.config["scan_slice_batches"] or 0)
        if S and num_batches > S:
            num_slices = -(-num_batches // S)
            nb2 = num_slices * S
            n_pad2 = nb2 * B

            @partial(jax.jit, donate_argnums=(0, 1))
            def train_slice_impl(params, opt_state, state, xs, buffers):
                with model.bound(buffers):
                    (params, opt_state, state), parts = jax.lax.scan(
                        batch_step, (params, opt_state, state), xs
                    )
                return params, opt_state, state, parts.sum(axis=0)

            @jax.jit
            def _plan(key):
                k_perm, k_scan = jax.random.split(key)
                perm = jax.random.permutation(k_perm, n_pad2)
                idxs = perm.reshape(nb2, B)
                keys = jax.random.split(k_scan, nb2)
                return idxs, keys, jnp.arange(nb2)

            def train_epoch(params, opt_state, state, key):
                idxs, keys, bids = _plan(key)
                totals = None
                for s in range(num_slices):
                    sl = slice(s * S, (s + 1) * S)
                    params, opt_state, state, t = train_slice_impl(
                        params, opt_state, state,
                        (idxs[sl], keys[sl], bids[sl]), model.buffers(),
                    )
                    totals = t if totals is None else totals + t
                return params, opt_state, state, totals

            train_epoch._cache_size = train_slice_impl._cache_size
            return optimizer, train_epoch

        @partial(jax.jit, donate_argnums=(0, 1))
        def train_epoch_impl(params, opt_state, state, key, buffers):
            with model.bound(buffers):
                k_perm, k_scan = jax.random.split(key)
                perm = jax.random.permutation(k_perm, n_pad)
                idxs = perm.reshape(num_batches, B)
                keys = jax.random.split(k_scan, num_batches)
                batch_ids = jnp.arange(num_batches)
                (params, opt_state, state), parts = jax.lax.scan(
                    batch_step,
                    (params, opt_state, state),
                    (idxs, keys, batch_ids),
                )
                totals = parts.sum(axis=0)  # summed per-part losses
            return params, opt_state, state, totals

        def train_epoch(params, opt_state, state, key):
            return train_epoch_impl(params, opt_state, state, key, model.buffers())

        train_epoch._cache_size = train_epoch_impl._cache_size
        return optimizer, train_epoch

    # ------------------------------------------------------------------
    def _build_eval_fn(self):
        model = self.model
        max_k = self.evaluator.max_k
        B = self.eval_batch_size
        n_items = self.model.n_items
        k_eff = min(max_k, n_items)
        # item-sharded eval: when a model axis exists, lay the (B, n_items)
        # score matrix's item dim over it and merge per-shard top-k results
        # (parallel.mesh.sharded_topk) instead of all-gathering full scores
        topk_mesh = None
        if self.mesh is not None and self.mesh.shape[MODEL_AXIS] > 1:
            if n_items // self.mesh.shape[MODEL_AXIS] >= k_eff:
                # uneven widths are handled by sharded_topk's -inf padding
                # (real catalogs are not axis multiples: elec 63001 = 251²)
                topk_mesh = self.mesh
            else:
                self.logger.warning(
                    "n_items %d too narrow for model axis %d at k=%d — "
                    "eval top-k stays unsharded",
                    n_items, self.mesh.shape[MODEL_AXIS], k_eff,
                )

        # models with user-independent eval computation (full propagated
        # matrices, CoDMR's two-stage p_sample, ...) provide eval_artifacts
        # computed ONCE per evaluation instead of per user-chunk
        from genmmrec_tpu.models.base import RecModel as _Base

        has_cache = (
            type(model).eval_artifacts is not _Base.eval_artifacts
            or type(model).full_embeddings is not _Base.full_embeddings
        )
        # GEMM-form eval (base scores_cached = u_emb @ i_emb.T): the item
        # matrix can be zero-padded ONCE to the 128-lane group boundary so
        # grouped_topk skips its per-chunk jnp.pad of the (B, n_items)
        # score plane — a full extra copy, measured ~13 ms/16k users at
        # elec width. The dense bit-mask covers the pad columns (bits set
        # by _dense_mask), so only that path may see padded scores.
        gemm_form = (
            has_cache and type(model).scores_cached is _Base.scores_cached
        )
        from genmmrec_tpu.ops.topk import _GROUP as _TKG

        n_items_pad = -(-n_items // _TKG) * _TKG
        # fully fused score+mask+top-k (ops/fused_topk.py): the (B, n)
        # score plane never touches HBM. Applies on the single-chip TPU
        # bf16 GEMM-form eval path with a dense mask; the mask is then
        # built in the kernel's planar bit layout (see _dense_mask).
        fused_form = (
            gemm_form
            and topk_mesh is None
            and jax.default_backend() == "tpu"
            and jax.device_count() == 1
            and model.eval_dtype == jnp.bfloat16
        )
        self._fused_eval = fused_form

        @partial(jax.jit, static_argnames=("n_chunks", "dense_mask"))
        def eval_topk_impl(params, state, users, mask_items, buffers, n_chunks, dense_mask=False):
            with model.bound(buffers):
                users_c = users.reshape(n_chunks, B)
                mask_c = mask_items.reshape(n_chunks, B, -1)
                arts = model.eval_artifacts(params, state) if has_cache else None
                fused_here = (
                    dense_mask
                    and fused_form
                    and isinstance(arts, tuple)
                    and len(arts) == 2
                    and hasattr(arts[1], "shape")
                    and arts[1].shape[0] == n_items
                )
                if dense_mask and fused_form and not fused_here:
                    # the planar mask layout was built for the fused path;
                    # consuming it on any other branch would silently
                    # corrupt the eval — fail loudly instead
                    raise RuntimeError(
                        "fused eval enabled but model artifacts are not "
                        "GEMM-form (u_emb, i_emb) — cannot fall back with "
                        "a planar mask"
                    )
                padfree = (
                    dense_mask
                    and topk_mesh is None
                    and not fused_here
                    and gemm_form
                    and isinstance(arts, tuple)
                    and len(arts) == 2
                    and hasattr(arts[1], "shape")
                    and arts[1].shape[0] == n_items
                    and n_items_pad != n_items
                )
                if padfree:
                    arts = (
                        arts[0],
                        jnp.pad(arts[1], ((0, n_items_pad - n_items), (0, 0))),
                    )

                def one(args):
                    u, m = args
                    if fused_here:
                        from genmmrec_tpu.ops.fused_topk import (
                            fused_grouped_topk,
                        )

                        # scores computed tile-by-tile inside the kernel
                        # (bf16 GEMM, f32 accum), masked in-register from
                        # the planar bit mask, folded straight into the
                        # grouped selection — no score plane in HBM
                        _, topk = fused_grouped_topk(
                            arts[0][u], arts[1], k_eff, m
                        )
                        if k_eff < max_k:
                            topk = jnp.pad(
                                topk,
                                ((0, 0), (0, max_k - k_eff)),
                                constant_values=-1,
                            )
                        return topk
                    if has_cache:
                        scores = model.scores_cached(params, state, u, arts)
                    else:
                        scores = model.scores(params, state, u)
                    if dense_mask:
                        if topk_mesh is None:
                            # bit-packed mask fused into the grouped top-k's
                            # fold pass (ops/topk.py) — the masked (B, n)
                            # plane is never materialized
                            _, topk = grouped_topk(
                                scores, k_eff, packed_mask=m
                            )
                        else:
                            bits = (
                                m[:, :, None] >> jnp.arange(8, dtype=jnp.uint8)
                            ) & jnp.uint8(1)
                            mask_bool = (
                                bits.reshape(m.shape[0], -1)[:, :n_items] != 0
                            )
                            scores = jnp.where(mask_bool, -1e10, scores)
                            _, topk = sharded_topk(scores, k_eff, topk_mesh)
                    else:
                        # scatter -inf over train positives; col n_items drops
                        rows = jnp.arange(u.shape[0])[:, None]
                        scores = scores.at[rows, m].set(-1e10, mode="drop")
                        if topk_mesh is not None:
                            _, topk = sharded_topk(scores, k_eff, topk_mesh)
                        else:
                            # exact two-stage top-k: lax.top_k's full-row
                            # sort dominated eval at catalog widths
                            _, topk = grouped_topk(scores, k_eff)
                    if k_eff < max_k:  # tiny catalogs: pad with -1 (no item)
                        topk = jnp.pad(
                            topk, ((0, 0), (0, max_k - k_eff)), constant_values=-1
                        )
                    return topk

                return jax.lax.map(one, (users_c, mask_c)).reshape(-1, max_k)

        def eval_topk(params, state, users, mask_items, n_chunks, dense_mask=False):
            return eval_topk_impl(
                params, state, users, mask_items, model.buffers(),
                n_chunks=n_chunks, dense_mask=dense_mask,
            )

        return eval_topk

    # eval masks are constant across evaluations — precompute a dense bool
    # matrix once per eval set when it fits the budget (the per-chunk
    # (B, max_train) scatter measured ~9ms/chunk on v5e vs ~0 for a where)
    # 2GB covers microlens (98k x 17k) and sports; elec (192k x 63k = 12GB)
    # falls back to the per-chunk scatter
    _DENSE_MASK_BUDGET = 2 * 1024 * 1024 * 1024  # bytes (bool)

    def _dense_mask(self, eval_data: EvalData, planar: bool = False):
        key = (id(eval_data), planar)
        cached = self._mask_cache.get(key)
        if cached is not None:
            return cached
        U_pad = eval_data.users.shape[0]
        n_items = eval_data.n_items
        # budget on the PACKED device footprint (uint8 bitmatrix, 8 items
        # per byte): elec's 192k x 63k mask is 1.5 GB packed — well inside
        # the budget that its 12 GB bool size used to fail
        if U_pad * (-(-n_items // 8)) > self._DENSE_MASK_BUDGET:
            return None
        # host build: an XLA scatter would serialize over U_pad*max_train
        # updates (padding sentinels included — minutes at 100k users);
        # numpy fancy-set over the real entries is O(nnz). Built in user
        # slabs so the transient bool plane stays small (elec would need
        # 12 GB host RAM in one piece), then shipped BIT-PACKED (8x smaller
        # host->device transfer on remote-attached TPUs); the bits are
        # consumed packed by ops/topk.py's fused masked top-k.
        m = np.asarray(eval_data.mask_items)
        # width = the top-k group boundary (the SAME _GROUP constant the
        # padfree eval path pads the item table to — engine/trainer.py
        # _TKG import), pad columns marked MASKED: the padfree eval path
        # scores a zero-padded item table, whose pad columns produce 0.0
        # scores that must never reach the top-k
        from genmmrec_tpu.ops.topk import _GROUP as _TKG

        n_pad = -(-n_items // _TKG) * _TKG
        if planar:
            # fused eval consumes the kernel's per-tile planar bit layout
            # (ops/fused_topk.py) at the TILE_N boundary (a _TKG multiple)
            from genmmrec_tpu.ops.fused_topk import (
                n_full_for, pack_planar_mask,
            )

            n_pad = n_full_for(n_items)
        packed_np = np.empty((U_pad, n_pad // 8), np.uint8)
        slab = max(1, (256 << 20) // max(n_pad, 1))  # ≤256 MB bool slab
        for lo in range(0, U_pad, slab):
            hi = min(lo + slab, U_pad)
            ms = m[lo:hi]
            valid = (ms < n_items).reshape(-1)
            rows = np.repeat(np.arange(hi - lo), ms.shape[1])[valid]
            cols = ms.reshape(-1)[valid]
            dense_np = np.zeros((hi - lo, n_pad), bool)
            dense_np[:, n_items:] = True
            dense_np[rows, cols] = True
            if planar:
                packed_np[lo:hi] = pack_planar_mask(dense_np)
            else:
                packed_np[lo:hi] = np.packbits(
                    dense_np, axis=1, bitorder="little"
                )
        packed = jnp.asarray(packed_np)
        self._mask_cache[key] = packed
        return packed

    # ------------------------------------------------------------------
    def fit(self, train_data, valid_data=None, test_data=None, saved=False, verbose=True):
        """train_data: TrainData; valid/test_data: EvalData."""
        td: TrainData = train_data
        seed_cfg = self.config["seed"]
        if isinstance(seed_cfg, list):
            seed_cfg = seed_cfg[0]
        seed = int(seed_cfg or 0)
        root_key = jax.random.PRNGKey(seed)
        k_init, k_state, k_run = jax.random.split(root_key, 3)

        params = self.model.init_params(k_init)
        self._state = self.model.init_state(k_state)
        # model-axis parameter sharding (embedding tables row-sharded over
        # ICI when mesh_shape requests a model axis); the optimizer init
        # runs AFTER placement so moments inherit the sharding
        if self.mesh is not None and self.mesh.shape[MODEL_AXIS] > 1:
            from genmmrec_tpu.parallel.mesh import shard_model_params

            params = shard_model_params(self.model, params, self.mesh)
            n_sharded = sum(
                1
                for leaf in jax.tree_util.tree_leaves(params)
                if hasattr(leaf, "sharding")
                and not leaf.sharding.is_fully_replicated
            )
            if n_sharded:
                self.logger.info(
                    "model-axis sharding: %d embedding tables row-sharded "
                    "over %d-way model axis",
                    n_sharded, self.mesh.shape[MODEL_AXIS],
                )
            else:
                self.logger.warning(
                    "mesh_shape requests a model axis but no parameter leaf "
                    "qualified for sharding (table rows must divide the axis)"
                )
        optimizer, train_epoch = self._build_train_step(td)
        opt_state = optimizer.init(params)

        # resume (the reference saves checkpoints but never wires a resume
        # path, `src/common/trainer.py:97`)
        resume = self.config["resume_checkpoint"]
        if resume:
            from genmmrec_tpu.engine.checkpoint import load_checkpoint

            ck = load_checkpoint(str(resume))
            to_dev = lambda ref, saved: jax.tree_util.tree_map(
                lambda r, s: jnp.asarray(s).astype(r.dtype)
                if hasattr(r, "dtype")
                else s,
                ref,
                saved,
            )
            params = to_dev(params, ck["params"])
            opt_state = to_dev(opt_state, ck["opt_state"])
            self._state = to_dev(self._state, ck["state"])
            self.start_epoch = int(ck["epoch"]) + 1
            self.best_valid_score = float(ck["best_valid_score"])
            if "best_valid_result" in ck:
                self.best_valid_result = ck["best_valid_result"]
            if "best_test_upon_valid" in ck:
                self.best_test_upon_valid = ck["best_test_upon_valid"]
            self.logger.info(
                "Resumed from %s at epoch %d (best valid %.4f)",
                resume, self.start_epoch, self.best_valid_score,
            )

        self._eval_fn = self._build_eval_fn()

        # bind large model buffers as jit ARGUMENTS here too: a bare
        # jit(model.pre_epoch) embeds v_feat/t_feat closures as program
        # constants, which blew the remote-compile size limit for MCDRec's
        # DGD resampling at sports scale (HTTP 413, zoo_sweep_sports_r3)
        @jax.jit
        def pre_epoch_impl(params, state, key, epoch, buffers):
            with self.model.bound(buffers):
                return self.model.pre_epoch(params, state, key, epoch)

        def pre_epoch(params, state, key, epoch):
            return pre_epoch_impl(params, state, key, epoch, self.model.buffers())

        if verbose:
            self.logger.info(self.model.describe(params))

        for epoch_idx in range(self.start_epoch, self.epochs):
            t0 = time()
            k_epoch = jax.random.fold_in(k_run, epoch_idx)
            k_pre, k_train, k_prelude = jax.random.split(k_epoch, 3)
            self._state = pre_epoch(params, self._state, k_pre, jnp.int32(epoch_idx))
            # specialized trainers (DiffMM/GenRecV1/MVDiff) run diffusion
            # training + graph regeneration phases here
            params = self._epoch_prelude(params, k_prelude, epoch_idx)

            if self.req_training:
                # tracing hook: capture ONE epoch's device profile when
                # profile_trace_dir is set (TPU replacement for the
                # reference's wall-clock-only timers, trainer.py:254-298)
                trace_dir = self.config["profile_trace_dir"]
                tracing = bool(trace_dir) and epoch_idx == self.start_epoch
                if tracing:
                    jax.profiler.start_trace(str(trace_dir))
                params, opt_state, self._state, totals = train_epoch(
                    params, opt_state, self._state, k_train
                )
                if tracing:
                    jax.block_until_ready(totals)
                    jax.profiler.stop_trace()
                    self.logger.info("profiler trace written to %s", trace_dir)
                totals = np.asarray(totals)
                if not np.all(np.isfinite(totals)):
                    self.logger.info(
                        "Loss is nan at epoch: %d. Exiting.", epoch_idx
                    )
                    break
                train_loss = tuple(totals.tolist()) if totals.size > 1 else float(totals[0])
            else:
                train_loss = 0.0
            self.train_loss_dict[epoch_idx] = (
                sum(train_loss) if isinstance(train_loss, tuple) else train_loss
            )
            t1 = time()
            self.epoch_times.append(t1 - t0)
            if verbose:
                if isinstance(train_loss, tuple):
                    loss_str = ", ".join(
                        f"train_loss{i + 1}: {l:.4f}" for i, l in enumerate(train_loss)
                    )
                else:
                    loss_str = f"train loss: {train_loss:.4f}"
                self.logger.info(
                    "epoch %d training [time: %.2fs, %s]", epoch_idx, t1 - t0, loss_str
                )
            post_info = self.model.post_epoch(params, self._state)
            if post_info is not None and verbose:
                self.logger.info(post_info)

            if self._wandb:
                log = {"epoch": epoch_idx, "train/time": t1 - t0}
                if isinstance(train_loss, tuple):
                    for i, l in enumerate(train_loss):
                        log[f"train/loss_{i + 1}"] = l
                    log["train/total_loss"] = sum(train_loss)
                else:
                    log["train/loss"] = train_loss
                self._wandb.log(log, step=epoch_idx)

            if valid_data is None or (epoch_idx + 1) % self.eval_step != 0:
                continue

            tv0 = time()
            valid_result = self.evaluate(params, valid_data)
            valid_score = valid_result[self.valid_metric]
            (
                self.best_valid_score,
                self.cur_step,
                stop_flag,
                update_flag,
            ) = early_stopping(
                valid_score,
                self.best_valid_score,
                self.cur_step,
                max_step=self.stopping_step,
                bigger=self.valid_metric_bigger,
            )
            tv1 = time()
            test_result = (
                self.evaluate(params, test_data, is_test=True)
                if test_data is not None
                else {}
            )
            if verbose:
                self.logger.info(
                    "epoch %d evaluating [time: %.2fs, valid_score: %f]",
                    epoch_idx,
                    tv1 - tv0,
                    valid_score,
                )
                self.logger.info("valid result: \n%s", dict2str(valid_result))
                self.logger.info("test result: \n%s", dict2str(test_result))

            if self._wandb:
                self._wandb.log(
                    {
                        "epoch": epoch_idx,
                        "valid/score": valid_score,
                        "valid/time": tv1 - tv0,
                        **{f"valid/{k}": v for k, v in valid_result.items()},
                        **{f"test/{k}": v for k, v in test_result.items()},
                    },
                    step=epoch_idx,
                )

            if update_flag:
                if verbose:
                    self.logger.info(
                        "██ %s--Best validation results updated!!!",
                        self.config["model"],
                    )
                self.best_valid_result = valid_result
                self.best_test_upon_valid = test_result
                if saved:
                    self._save_checkpoint(params, opt_state, epoch_idx)
            if stop_flag:
                if verbose:
                    self.logger.info(
                        "+++++Finished training, best eval result in epoch %d",
                        epoch_idx - self.cur_step * self.eval_step,
                    )
                break

        self.params = params
        return self.best_valid_score, self.best_valid_result, self.best_test_upon_valid

    # ------------------------------------------------------------------
    def _epoch_prelude(self, params, key, epoch_idx):
        """Hook for multi-phase trainers; returns possibly-updated params."""
        return params

    # ------------------------------------------------------------------
    def _shard_eval_inputs(self, users, mask_items):
        """Multi-chip: spread the per-chunk user batch over the mesh's data
        axis. Chunks run in a sequential ``lax.map``; inside each chunk the
        users (and therefore the full-sort score matmul + top-k) split
        across devices, with parameters replicated — sharding propagates
        from these input annotations (no distributed layer exists in the
        reference; `SURVEY.md` §2.5)."""
        if jax.device_count() <= 1 or self.mesh is None:
            return users, mask_items
        if self.eval_batch_size % self.mesh.shape["data"] != 0:
            if not getattr(self, "_warned_eval_shard", False):
                self.logger.warning(
                    "eval_batch_size %d not divisible by data axis %d — "
                    "eval stays single-device over users",
                    self.eval_batch_size, self.mesh.shape["data"],
                )
                self._warned_eval_shard = True
            return users, mask_items
        sh = data_sharding(self.mesh)
        return jax.device_put(users, sh), jax.device_put(mask_items, sh)

    def evaluate(self, params, eval_data: EvalData, is_test: bool = False, idx: int = 0):
        if self._eval_fn is None:
            self._eval_fn = self._build_eval_fn()
        n_chunks = eval_data.users.shape[0] // self.eval_batch_size
        dense = self._dense_mask(eval_data, planar=self._fused_eval)
        mask = dense if dense is not None else eval_data.mask_items
        users, mask = self._shard_eval_inputs(eval_data.users, mask)
        topk_index = self._eval_fn(
            params, self._state, users, mask, n_chunks, dense_mask=dense is not None
        )
        return self.evaluator.evaluate(
            topk_index,
            eval_data,
            pop_mask=self.pop_mask,
            warm_mask=self.warm_mask if is_test else None,
            is_test=is_test,
            idx=idx,
        )

    # ------------------------------------------------------------------
    def _save_checkpoint(self, params, opt_state, epoch: int) -> None:
        from genmmrec_tpu.engine.checkpoint import save_checkpoint

        ckpt_dir = self.config["checkpoint_dir"] or "saved"
        path = os.path.join(
            ckpt_dir, f"{self.config['model']}-{self.config['dataset']}"
        )
        save_checkpoint(
            path,
            params=params,
            opt_state=opt_state,
            state=self._state,
            epoch=epoch,
            best_valid_score=self.best_valid_score,
            best_valid_result=self.best_valid_result,
            best_test_upon_valid=self.best_test_upon_valid,
        )
        self.logger.info("Saved best model to %s", path)

    def plot_train_loss(self, show=True, save_path=None):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        epochs = sorted(self.train_loss_dict.keys())
        values = [float(self.train_loss_dict[e]) for e in epochs]
        plt.plot(epochs, values)
        plt.xlabel("Epoch")
        plt.ylabel("Loss")
        if save_path:
            plt.savefig(save_path)
