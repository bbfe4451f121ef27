from . import extended, pipeline  # noqa: F401  (register query batches)
from .catalog import ORACLES, QUERIES  # noqa: F401
