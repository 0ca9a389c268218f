"""Import every op module so registration side-effects run (SURVEY §7.1)."""

from . import scans  # noqa: F401
from . import aggs  # noqa: F401
