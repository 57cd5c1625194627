"""Domain-split query catalog (see queries.base for the registry)."""
