"""Pallas TPU ray-march kernel (placeholder — implemented in a later
milestone; `march(backend='auto')` falls back to the XLA while-loop)."""
from __future__ import annotations


def march_pallas(metric, x0, p0, *, dt, max_steps, escape_radius,
                 stepper="euler"):
    raise NotImplementedError("pallas march kernel not yet implemented")
