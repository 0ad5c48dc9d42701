"""Operation modules (creation, manipulation, reductions, linalg, ...)."""
