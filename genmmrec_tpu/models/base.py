"""Functional model base class.

Capability parity with the reference's model API
(`src/common/abstract_recommender.py:10-103`): models consume the merged
config plus the training data, expose ``calculate_loss`` over a
``[users, pos, neg]`` batch and ``full_sort_predict`` over a user batch, and
may hook per-epoch processing.

TPU-native design deltas:
- parameters are an explicit pytree returned by ``init_params(key)`` — no
  hidden module state, so the trainer can jit/pjit/donate freely;
- mutable per-epoch artifacts (rebuilt graphs, dropped edges, generated
  interactions) live in an explicit ``state`` pytree transformed by the pure
  ``pre_epoch``/``post_epoch`` hooks;
- all stochastic ops take explicit PRNG keys.

Batch convention (mirrors the reference's stacked tensor,
`src/utils/dataloader.py:226-250`): a dict with ``users``/``pos``/``neg``
int32 vectors and a float ``weight`` vector (0 for padded rows).
"""

from __future__ import annotations

import contextlib
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from genmmrec_tpu.data.arrays import TrainData
from genmmrec_tpu.data.features import load_modal_features

Params = Any
State = Any
Batch = Dict[str, jnp.ndarray]


def scalar(value, cast=float, default=None):
    """Resolve a config value that may still be a hyper-grid list (tests /
    direct use bypass the grid loop, which scalarizes). Lists take their
    first entry, mirroring the reference's default-on-first-combo behavior.

    ``default`` applies ONLY when the config value is absent (None) — unlike
    the ``config[k] or default`` idiom, an explicit 0/0.0 is kept, so
    ablations like ``lambda_rf: 0.0`` actually turn the term off."""
    if isinstance(value, list):
        value = value[0]
    if value is None and default is not None:
        value = default
    return cast(value)


class RecModel:
    """Base for all recommenders. Subclasses implement the pure methods."""

    # set False for pure-CF models (BPR/LightGCN/...)
    is_multimodal = True

    def __init__(self, config, data: TrainData):
        self.config = config
        self.data = data
        self.n_users = data.n_users
        self.n_items = data.n_items
        self.batch_size = int(config["train_batch_size"])
        # full-sort eval scoring dtype. 'bfloat16' halves the dominant HBM
        # traffic of evaluation (the (B, n_items) score matrix write + top-k
        # read) on TPU; scores only feed top-k index selection, so the
        # reduced mantissa moves metrics only through near-tie reordering.
        # Default float32 = bit-identical parity with the reference.
        self.eval_dtype = jnp.dtype(str(config["eval_dtype"] or "float32"))
        self.v_feat: Optional[jnp.ndarray] = None
        self.t_feat: Optional[jnp.ndarray] = None
        self._v_feat_host = None
        self._t_feat_host = None
        if config["is_multimodal_model"] and self.is_multimodal:
            (
                self.v_feat,
                self.t_feat,
                self._v_feat_host,
                self._t_feat_host,
            ) = load_modal_features(config, self.n_items)
            assert self.v_feat is not None or self.t_feat is not None, "Features all NONE"

    # -- pure API -------------------------------------------------------
    def init_params(self, key: jax.Array) -> Params:
        raise NotImplementedError

    def init_state(self, key: jax.Array) -> State:
        return {}

    def loss(
        self, params: Params, state: State, batch: Batch, key: jax.Array
    ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, ...]]:
        """Return (total_loss, per-part losses)."""
        raise NotImplementedError

    def scores(self, params: Params, state: State, users: jnp.ndarray) -> jnp.ndarray:
        """Full-catalog scores, shape (len(users), n_items)."""
        raise NotImplementedError

    # -- cached full-sort evaluation ------------------------------------
    # Models whose scores are U @ Iᵀ over full propagated matrices should
    # override ``full_embeddings`` — the trainer then computes the matrices
    # ONCE per evaluation instead of once per user-chunk (the reference
    # recomputes the full forward for every eval batch,
    # `src/common/trainer.py:379-387`).
    def full_embeddings(self, params: Params, state: State):
        return None  # override to enable cached eval

    def eval_artifacts(self, params: Params, state: State):
        return self.full_embeddings(params, state)

    def scores_cached(self, params, state, users, artifacts):
        if artifacts is None:  # static (trace-time) fallback
            return self.scores(params, state, users)
        u, i = artifacts
        if self.eval_dtype == jnp.bfloat16:
            # bf16 scoring path: bf16 operands AND bf16 scores (the MXU
            # accumulates in f32 internally; materializing bf16 halves the
            # score-matrix HBM write and the top-k read that dominate
            # full-sort eval at embedding_size«n_items)
            return u[users].astype(jnp.bfloat16) @ i.T.astype(jnp.bfloat16)
        return u[users] @ i.T

    def loss_and_update(
        self, params: Params, state: State, batch: Batch, key: jax.Array
    ) -> Tuple[jnp.ndarray, Tuple[Tuple[jnp.ndarray, ...], State]]:
        """Loss plus per-batch state update (e.g. importance-sampling
        history buffers). Default: state unchanged. The trainer carries the
        returned state through the epoch scan; gradients flow only through
        the loss."""
        total, parts = self.loss(params, state, batch, key)
        return total, (parts, state)

    def pre_epoch(
        self, params: Params, state: State, key: jax.Array, epoch: jnp.ndarray
    ) -> State:
        """Pure per-epoch state transform (e.g. edge dropout). Jitted."""
        return state

    def post_epoch(self, params: Params, state: State) -> Optional[str]:
        """Host-side hook after each epoch; may return a log string."""
        return None

    # -- large-buffer binding --------------------------------------------
    # jit closure constants are EMBEDDED in the compile payload; at scale
    # (sports+: 300MB modal features, 2.6GB KNN score tables) that breaks
    # the remote-compile size limit. The trainer passes these arrays as jit
    # ARGUMENTS and temporarily binds them onto the model during tracing.
    buffer_names: Tuple[str, ...] = ("v_feat", "t_feat", "data")

    def buffers(self) -> Dict[str, Any]:
        return {
            k: getattr(self, k)
            for k in self.buffer_names
            if getattr(self, k, None) is not None
        }

    @contextlib.contextmanager
    def bound(self, buffers: Dict[str, Any]):
        old = {k: getattr(self, k) for k in buffers}
        try:
            for k, v in buffers.items():
                setattr(self, k, v)
            yield
        finally:
            for k, v in old.items():
                setattr(self, k, v)

    # -- conveniences ---------------------------------------------------
    # host copies for ctor-time graph builders: device→host downloads via
    # the remote-chip tunnel are ~3MB/s, so np.asarray(self.v_feat) on
    # sports+ features costs minutes — use these instead
    @property
    def v_feat_np(self):
        import numpy as _np

        if self._v_feat_host is not None:
            return self._v_feat_host
        return _np.asarray(self.v_feat) if self.v_feat is not None else None

    @property
    def t_feat_np(self):
        import numpy as _np

        if self._t_feat_host is not None:
            return self._t_feat_host
        return _np.asarray(self.t_feat) if self.t_feat is not None else None

    @property
    def item_raw_features_np(self):
        import numpy as _np

        v, t = self.v_feat_np, self.t_feat_np
        if v is not None and t is not None:
            return _np.concatenate([t, v], axis=-1)
        return v if v is not None else t

    @property
    def item_raw_features(self) -> jnp.ndarray:
        """Concatenated (text, vision) raw features, reference VBPR pattern
        (`src/models/vbpr.py:33-38`)."""
        if self.v_feat is not None and self.t_feat is not None:
            return jnp.concatenate([self.t_feat, self.v_feat], axis=-1)
        return self.v_feat if self.v_feat is not None else self.t_feat

    def param_count(self, params: Params) -> int:
        return sum(p.size for p in jax.tree_util.tree_leaves(params))

    def describe(self, params: Params) -> str:
        return f"{type(self).__name__}\nTrainable parameters: {self.param_count(params)}"
