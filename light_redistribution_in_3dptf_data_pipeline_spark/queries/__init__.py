"""Oracle-checked query registry.

Every operator from SURVEY.md §2 marked [Q] is declared here as a
``Query``: a PySpark builder plus (when SQL-expressible) an equivalent
ANSI-SQL oracle string for DuckDB. ``__spark_entry__.py`` exposes the
registry to the driver.
"""

from __future__ import annotations

from .registry import QUERIES, Query, register  # noqa: F401

# Import side-effect modules that populate the registry. ORDER MATTERS:
# the driver verifies the FIRST 50 queries in registration order. Since
# r5 EVERY registered query is oracle-backed (the former rows-only
# rows — mm's binary-UDF pipeline and a12's sketches — were promoted
# via byte-exact restatement and error-bound verdicts respectively),
# so ordering no longer trades verification strength; it is kept
# stable anyway so CORRECTNESS rows diff cleanly across rounds. The
# total is kept ≤ 50 by folding related operators into composite
# queries — every SURVEY §2 [Q] operator keeps a registered,
# oracle-checked home; a registry test (tests/test_registry_budget.py)
# enforces the budget and the all-inside-window invariant so additions
# can never silently rotate a verified query out of the window again
# (the r3 regression).
from . import windows       # noqa: F401,E402  flagship + W* + w11
from . import generators    # noqa: F401,E402  F14/W5 + F13
from . import text          # noqa: F401,E402  tx* (tokens/quality/dedup)
from . import clusters      # noqa: F401,E402  dx4 (CC dedup clustering)
from . import sampling      # noqa: F401,E402  smp1 (deterministic sampling)
from . import similarity    # noqa: F401,E402  sim*/dx3 (ANN/IVF)
from . import filters       # noqa: F401,E402  S1/S2 + P*
from . import joins         # noqa: F401,E402  J*
from . import aggregates    # noqa: F401,E402  A* (incl. a12 verdicts)
from . import sorts         # noqa: F401,E402  T*
from . import setops        # noqa: F401,E402  X*
from . import scalars       # noqa: F401,E402  F* + S4/S7
from . import multimodal    # noqa: F401,E402  mm* (binary UDF stages)

# Operator modules (dx2/dx5/sx1_sx2/sx3 — all oracle-checked).
from ..operators import dedup as _op_dedup          # noqa: F401,E402
from ..operators import similarity as _op_sim       # noqa: F401,E402
