"""Specialized multi-phase trainers for generative models.

Parity targets: ``DiffMMTrainer`` (`src/common/trainer.py:410-585`),
``GenRecV1Trainer`` (:588-820), ``MVDiffTrainer`` (:822-1202). Each runs
extra per-epoch phases (diffusion-denoiser training, graph regeneration)
before the standard BPR epoch.

Round-1 status: placeholders that fall back to the generic Trainer; filled
in alongside the corresponding models.
"""

from __future__ import annotations

from genmmrec_tpu.engine.trainer import Trainer


class DiffMMTrainer(Trainer):
    pass


class GenRecV1Trainer(Trainer):
    pass


class MVDiffTrainer(Trainer):
    pass
