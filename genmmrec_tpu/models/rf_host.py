"""Generic RF-host integration mixin.

The reference's 15 RF* variants (`src/models/rfbm3.py`, `rffreedom.py`,
`rflattice.py`, ... each 200-340 lines) repeat one pattern around their base
model:
- instantiate ``RFEmbeddingGenerator`` from ``rf_*`` config keys;
- per epoch, bump the RF epoch counter (``pre_epoch_processing``);
- during training, train the RF module on the *detached* final host
  representations with modal conditions (item projections lifted to users
  via the interaction matrix), adding its loss to the total;
- at inference, mix ``final + inference_mix_ratio · generated`` into the
  scoring embeddings once past warmup.

``RFHostMixin`` implements that machinery once; a variant supplies
``rf_host_repr(params, state) -> (N, d)`` (the host's final stacked
user+item representation) and ``rf_condition_feats(params)`` (list of item
feature matrices to lift+concat as conditions).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np
import optax

from genmmrec_tpu.models import rf_modules as rf
from genmmrec_tpu.ops.graph import SparseGraph, spmm


class RFHostMixin:
    """Mix into a RecModel subclass; call ``_rf_setup(config)`` at the end
    of ``__init__``."""

    def _rf_setup(self, config, embedding_dim: int):
        self.use_rf = True if config["use_rf"] is None else bool(config["use_rf"])
        self.rf_cfg = rf.RFConfig.from_config(
            config, self.n_users, self.n_items, embedding_dim
        )
        self._rf_dim = embedding_dim
        users = np.asarray(self.data.users)
        items = np.asarray(self.data.items)
        order = np.argsort(users, kind="stable")
        self._rf_R = SparseGraph(
            rows=jnp.asarray(users[order].astype(np.int32)),
            cols=jnp.asarray(items[order].astype(np.int32)),
            vals=jnp.ones(len(users), jnp.float32),
            n_rows=self.n_users,
            n_cols=self.n_items,
        ).with_span()

    # -- hooks ----------------------------------------------------------
    def rf_host_repr(self, params, state) -> jnp.ndarray:
        """(n_users+n_items, d) final host representation."""
        raise NotImplementedError

    def rf_condition_feats(self, params) -> List[jnp.ndarray]:
        """Item-level feature matrices used as conditions (each (I, d_c))."""
        raise NotImplementedError

    def rf_condition_dim(self) -> int:
        return sum(f.shape[1] for f in self._rf_cond_shapes())

    def _rf_cond_shapes(self):
        # default: probe once with dummy params is impossible; variants set
        # _rf_condition_dim explicitly instead
        raise NotImplementedError

    # -- framework overrides -------------------------------------------
    def init_params(self, key):
        k_host, k_rf = jax.random.split(key)
        params = super().init_params(k_host)
        if self.use_rf:
            params["rf"] = rf.init_velocity_net(
                k_rf, self.rf_cfg, self._rf_condition_dim
            )
        return params

    def param_labels(self, params):
        labels = {
            k: jax.tree_util.tree_map(lambda _: "main", v)
            for k, v in params.items()
            if k != "rf"
        }
        if "rf" in params:
            labels["rf"] = jax.tree_util.tree_map(lambda _: "rf", params["rf"])
        return labels

    def label_transforms(self):
        return {"rf": optax.adamw(self.rf_cfg.learning_rate)}

    def init_state(self, key):
        base = super().init_state(key)
        return {**(base or {}), "rf_epoch": jnp.int32(0)}

    def pre_epoch(self, params, state, key, epoch):
        new = super().pre_epoch(params, {k: v for k, v in state.items() if k != "rf_epoch"}, key, epoch)
        return {**(new or {}), "rf_epoch": jnp.int32(epoch)}

    def _rf_conditions(self, params):
        feats = self.rf_condition_feats(params)
        conds = []
        for f in feats:
            user_side = spmm(self._rf_R, f)
            conds.append(jnp.concatenate([user_side, f], axis=0))
        return jnp.concatenate(conds, axis=-1)

    def loss(self, params, state, batch, key):
        total, parts = super().loss(params, state, batch, key)
        if not self.use_rf:
            return total, parts
        sg = jax.lax.stop_gradient
        k_rf = jax.random.fold_in(key, 1317)
        target = sg(self.rf_host_repr(params, state))
        conditions = sg(self._rf_conditions(params))
        rf_total, rf_flow, rf_cl = rf.rf_losses_staged(
            params["rf"],
            self.rf_cfg,
            k_rf,
            state["rf_epoch"],
            target,
            conditions,
            None,
            batch["users"],
            batch["pos"],
            batch["weight"],
        )
        # report each part like the reference RF hosts do (host parts, then
        # the RF straight-path and contrastive losses separately)
        return total + rf_total, tuple(parts) + (rf_flow, rf_cl)

    def full_embeddings(self, params, state):
        if not self.use_rf:
            return super().full_embeddings(params, state)
        final = self.rf_host_repr(params, state)
        conditions = self._rf_conditions(params)
        generated = rf.generate_staged(
            params["rf"], self.rf_cfg, jax.random.PRNGKey(0), conditions,
            state["rf_epoch"],
        )
        warmed = (state["rf_epoch"] >= self.rf_cfg.warmup_epochs).astype(jnp.float32)
        mixed = final + warmed * self.rf_cfg.inference_mix_ratio * generated
        return mixed[: self.n_users], mixed[self.n_users :]

    def scores(self, params, state, users):
        if not self.use_rf:
            return super().scores(params, state, users)
        u, i = self.full_embeddings(params, state)
        return u[users] @ i.T
