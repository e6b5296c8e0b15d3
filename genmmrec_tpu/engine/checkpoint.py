"""Checkpointing with resume support.

Parity-plus vs the reference ``_save_checkpoint``
(`src/common/trainer.py:345-366`): the reference saves
``{config, epoch, state_dict, optimizer, best_valid_score}`` but never wires
a resume path. Here both save and load are first-class, and the model's
mutable ``state`` (e.g. regenerated graphs — which the reference knowingly
omits, `src/models/diffmm.py:263-274`) is included.

Implementation: a single ``.npz``-style flat archive via numpy (portable,
no directory layout requirements) with the pytree structure stored alongside.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict

import jax
import numpy as np


def save_checkpoint(path: str, **entries: Any) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    host_entries = jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x, entries
    )
    with open(path + ".ckpt", "wb") as f:
        pickle.dump(host_entries, f, protocol=4)


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path + ".ckpt", "rb") as f:
        return pickle.load(f)
