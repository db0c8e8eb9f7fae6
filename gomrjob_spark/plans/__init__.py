"""Query library. Importing this package populates the registry."""

from gomrjob_spark.plans.registry import ORACLES, QUERIES, query  # noqa: F401
from gomrjob_spark.plans import (  # noqa: F401,E402
    extras,
    llm,
    mr,
    relational,
    streaming,
    subqueries,
    timeseries,
    tpch,
)
