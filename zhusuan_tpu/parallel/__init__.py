"""Device-mesh parallelism utilities (DP/chain sharding over ICI)."""

__all__ = []
