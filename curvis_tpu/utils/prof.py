"""Profiling helpers: wall-clock stage timers + rays/s counters
(SURVEY.md section 5 — the reference's only instrumentation is println!).

On the remote-TPU tunnel used for development, block_until_ready returns at
enqueue time; `materialize` forces completion through a scalar host fetch,
which is what every timing helper here uses.
"""
from __future__ import annotations

import contextlib
import json
import time

import jax
import jax.numpy as jnp


def materialize(tree):
    """Force device completion via a scalar dependency + host fetch."""
    leaves = [x for x in jax.tree_util.tree_leaves(tree)
              if hasattr(x, "dtype")]
    if not leaves:
        return tree
    acc = sum(jnp.sum(x).astype(jnp.float32) for x in leaves)
    float(acc)
    return tree


class StageTimer:
    """Accumulates named wall-clock stages; reports a JSON summary."""

    def __init__(self):
        self.stages: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name, sync=True):
        """Time a stage. Yields a list: append device arrays produced inside
        and they are materialized before the clock stops. With an empty
        holder and sync=True, a barrier scalar is enqueued and fetched —
        device streams execute in order, so the fetch drains everything the
        stage enqueued (block_until_ready alone returns at enqueue time on
        the remote tunnel; see CLAUDE.md)."""
        holder: list = []
        t0 = time.time()
        yield holder
        if sync:
            if holder:
                materialize(holder)
            else:
                float(jnp.add(jnp.float32(0), jnp.float32(0)))
        dt = time.time() - t0
        self.stages[name] = self.stages.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def record(self, name, seconds):
        self.stages[name] = self.stages.get(name, 0.0) + seconds
        self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self, rays=None):
        out = {k: round(v, 4) for k, v in self.stages.items()}
        total = sum(self.stages.values())
        out["total"] = round(total, 4)
        if rays and total > 0:
            out["Mrays_per_s"] = round(rays / total / 1e6, 3)
        return out

    def report(self, rays=None):
        return json.dumps(self.summary(rays))


def time_fn(fn, *args, iters=3, warmup=1):
    """Best-of-n wall time of a jitted callable whose output is reduced to a
    scalar for materialization."""
    for _ in range(warmup):
        materialize(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        materialize(fn(*args))
        best = min(best, time.time() - t0)
    return best


def trace(log_dir):
    """jax.profiler trace context for deep dives (view with TensorBoard or
    xprof)."""
    return jax.profiler.trace(str(log_dir))
