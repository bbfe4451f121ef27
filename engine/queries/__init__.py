from . import pipeline  # noqa: F401  (registers pipeline queries)
from .catalog import ORACLES, QUERIES  # noqa: F401
