"""Utilities: visualization (L7) and metrics logging."""
from .logging import MetricsLogger
