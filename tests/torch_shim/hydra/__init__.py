"""Minimal `hydra` stand-in for executing reference model code on CPU.

The reference's `src.utils.config.instantiate` only touches
`hydra.utils.get_class` / `get_method` (plain import-path resolvers); no
config composition is involved at model runtime.
"""

from . import utils  # noqa: F401
