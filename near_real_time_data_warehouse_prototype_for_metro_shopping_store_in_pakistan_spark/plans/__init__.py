from . import oracles, queries, star  # noqa: F401
