import importlib


def _resolve(path: str):
    module, _, name = path.rpartition(".")
    return getattr(importlib.import_module(module), name)


def get_class(path: str):
    return _resolve(path)


def get_method(path: str):
    return _resolve(path)
