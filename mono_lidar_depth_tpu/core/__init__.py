"""Core depth-estimation pipeline (L0/L1 of the reference stack)."""
