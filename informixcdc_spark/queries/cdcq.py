"""CDC-semantics queries (filled in with the cdc/ layer — M2)."""
