from . import pipeline, sinks, state  # noqa: F401
