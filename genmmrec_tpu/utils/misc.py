"""Small shared utilities.

Capability parity with the reference's ``src/utils/utils.py`` helpers
(``get_local_time`` :16, ``init_seed`` :61, ``early_stopping`` :70,
``dict2str`` :114), re-expressed for a JAX stack (no torch/cuda seeding; JAX
randomness is explicit via threaded keys, so ``init_seed`` only seeds host-side
``random``/``numpy`` used for data shuffling decisions).
"""

from __future__ import annotations

import datetime
import random

import numpy as np


def get_local_time() -> str:
    return datetime.datetime.now().strftime("%b-%d-%Y-%H-%M-%S")


def init_seed(seed: int) -> None:
    """Seed host-side RNGs. Device randomness is key-threaded (jax.random)."""
    random.seed(seed)
    np.random.seed(seed)


def early_stopping(value, best, cur_step, max_step, bigger=True):
    """Validation-based early stopping.

    Returns ``(best, cur_step, stop_flag, update_flag)`` with the same
    semantics as the reference (`src/utils/utils.py:70-111`): a strict
    improvement resets the counter; ``stop_flag`` raises once ``cur_step``
    exceeds ``max_step``.
    """
    stop_flag, update_flag = False, False
    improved = (value > best) if bigger else (value < best)
    if improved:
        best, cur_step, update_flag = value, 0, True
    else:
        cur_step += 1
        stop_flag = cur_step > max_step
    return best, cur_step, stop_flag, update_flag


def dict2str(result_dict) -> str:
    return "    ".join(f"{k}: {v:.04f}" for k, v in result_dict.items()) + "    "
