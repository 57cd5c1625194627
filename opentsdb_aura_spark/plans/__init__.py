"""Query planning: the engine-level composition of operators."""
