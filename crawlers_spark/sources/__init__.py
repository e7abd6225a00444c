from . import synthweb, tables  # noqa: F401
