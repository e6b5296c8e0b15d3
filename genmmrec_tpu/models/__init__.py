"""Model registry.

Parity with the reference's importlib-based ``get_model``
(`src/utils/utils.py:28-41`): model classes are resolved by name from
``genmmrec_tpu.models.<name.lower()>``.
"""

from __future__ import annotations

import importlib


def get_model(model_name: str):
    module = importlib.import_module(f"genmmrec_tpu.models.{model_name.lower()}")
    return getattr(module, model_name)
