"""Structured Streaming layer — pipeline, keyed state, sinks, metrics."""

from . import metrics, pipeline, sinks, state  # noqa: F401
