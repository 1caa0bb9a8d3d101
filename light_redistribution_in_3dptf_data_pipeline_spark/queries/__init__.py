"""Oracle-checked query registry.

Every operator from SURVEY.md §2 marked [Q] is declared here as a
``Query``: a PySpark builder plus (when SQL-expressible) an equivalent
ANSI-SQL oracle string for DuckDB. ``__spark_entry__.py`` exposes the
registry to the driver.
"""

from __future__ import annotations

from .registry import QUERIES, Query, register  # noqa: F401

# Import side-effect modules that populate the registry.
from . import windows       # noqa: F401,E402
from . import filters       # noqa: F401,E402
from . import joins         # noqa: F401,E402
from . import aggregates    # noqa: F401,E402
from . import sorts         # noqa: F401,E402
from . import setops        # noqa: F401,E402
from . import scalars       # noqa: F401,E402
from . import generators    # noqa: F401,E402
from . import text          # noqa: F401,E402
from . import similarity    # noqa: F401,E402
from . import multimodal    # noqa: F401,E402

# Operator modules that register rows-only (non-SQL-expressible) queries.
from ..operators import dedup as _op_dedup          # noqa: F401,E402
from ..operators import similarity as _op_sim       # noqa: F401,E402
