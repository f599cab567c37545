"""Normalizing flows (planar, IAF). Full implementation lands with the
flow examples; parity target: reference ``zhusuan/transform.py``."""

__all__ = []
