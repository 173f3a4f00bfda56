from . import pipelines, sinks, sources  # noqa: F401
