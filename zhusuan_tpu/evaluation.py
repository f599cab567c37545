"""Evaluation: is_loglikelihood and AIS. Parity target: reference
``zhusuan/evaluation.py``."""

__all__ = []
