from . import utilities  # noqa: F401
