from . import extended, pipeline, search  # noqa: F401  (register query batches)
from .catalog import ORACLES, QUERIES  # noqa: F401
