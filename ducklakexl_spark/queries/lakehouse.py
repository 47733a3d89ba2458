"""Lakehouse-engine queries: exercise DuckLakeSpark (catalog, snapshots,
DML, time travel) end to end inside the driver's queries()/oracle_sql()
gate.  Oracles are constant VALUES tables because the engine flow is fully
deterministic (it replays the reference's own smoke sequence,
ducklakexl.py:716-741).

Filled in together with ducklakexl_spark.engine (Phase 1/3 of SURVEY §7).
"""

from __future__ import annotations
