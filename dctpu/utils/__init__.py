"""Utilities: timing against the axon platform quirks, run metrics, tracing."""

from dctpu.utils.timing import device_time, fetch_sync  # noqa: F401
from dctpu.utils.metrics import RunMetrics  # noqa: F401
