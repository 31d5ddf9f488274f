from .icehouse import (
    PART_COL,
    CommitConflictError,
    CommitResult,
    ConcurrentCommitError,
    IcehouseTable,
    SchemaEvolutionError,
    conform_to_schema,
    evolve_schema,
)

__all__ = [
    "PART_COL",
    "CommitConflictError",
    "CommitResult",
    "ConcurrentCommitError",
    "IcehouseTable",
    "SchemaEvolutionError",
    "conform_to_schema",
    "evolve_schema",
]
