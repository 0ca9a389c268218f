"""Import every op module so registration side-effects run (SURVEY §7.1)."""

from . import scans  # noqa: F401
from . import aggs  # noqa: F401
from . import filters  # noqa: F401
from . import pii  # noqa: F401
from . import joins  # noqa: F401
from . import sorts  # noqa: F401
from . import windows  # noqa: F401
from . import functions  # noqa: F401
from . import aggs_advanced  # noqa: F401
from . import llm  # noqa: F401
from . import multimodal  # noqa: F401
from . import ann  # noqa: F401
from . import streaming  # noqa: F401
from . import udfs  # noqa: F401
from . import headline  # noqa: F401
from . import timeseries  # noqa: F401
from . import reshape  # noqa: F401
from . import tpch  # noqa: F401
from . import mutations  # noqa: F401
from . import trainprep  # noqa: F401
from . import graph  # noqa: F401
from . import sqlsurface  # noqa: F401
from . import analytics  # noqa: F401
from . import markov  # noqa: F401
from . import avro  # noqa: F401
