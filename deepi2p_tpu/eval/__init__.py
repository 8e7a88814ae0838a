"""Inference dump + registration evaluation harness (reference L6 scripts)."""
from .dump import dump_predictions, load_dump, save_sample_dump
from .harness import evaluate_registration, random_pose_baseline
