"""Training engine (L3/L5 of the reference layer map).

Replaces ``MMClassifer`` / ``MMClassiferCoarse``
(``models/multimodal_classifier.py:25-682``) with a pure-functional jitted
train step: GT labels are generated on-device inside the step (as the
reference does on-GPU), the loss is focal(coarse) + masked CE(fine), and the
optimiser is optax Adam with the reference's step-decay schedule.
"""
from .loss import focal_loss, masked_fine_ce, classification_loss
from .engine import Engine, TrainState, make_lr_schedule
