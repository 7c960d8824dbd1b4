from . import text, time, vectors  # noqa: F401
