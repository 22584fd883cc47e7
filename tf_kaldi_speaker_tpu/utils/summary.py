"""Training observability: scalar summaries + JAX profiler traces.

Replaces the reference's TensorBoard summary plumbing (trainer.py:360-376,
424-433; misc/utils.py:333-346 activation histograms) with:

- ``SummaryWriter``: scalar summaries in TWO formats per step — an
  append-only JSONL log (<model>/events.jsonl; greppable, plottable) AND a
  real TensorBoard events.out.tfevents.* file (utils/tb_events.py; no TF
  dependency), matching the reference's TB workflow.
- ``profile_trace``: context manager around jax.profiler for step traces
  (<model>/profile/), viewable in TensorBoard/XProf. The reference had no
  timeline tracing at all (SURVEY.md §5).
- ``activation_summaries``: endpoint activation statistics (mean/std/
  fraction-zero) for debugging, computed on-device in one pass.
"""

from __future__ import annotations

import json
import os
import time
from contextlib import contextmanager
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


class SummaryWriter:
    def __init__(self, logdir: str, filename: str = "events.jsonl",
                 tensorboard: bool = True):
        from .tb_events import TBEventWriter

        os.makedirs(logdir, exist_ok=True)
        self.path = os.path.join(logdir, filename)
        self._fp = open(self.path, "a")
        self._tb = TBEventWriter(logdir) if tensorboard else None
        self._t0 = time.time()

    def scalars(self, step: int, values: Dict[str, float]) -> None:
        rec = {"step": int(step), "wall": round(time.time() - self._t0, 3)}
        for k, v in values.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                pass
        self._fp.write(json.dumps(rec) + "\n")
        self._fp.flush()
        if self._tb is not None:
            tags = {k: v for k, v in rec.items() if k not in ("step", "wall")}
            self._tb.scalars(step, tags)

    def histograms(self, step: int, tensors: Dict[str, "np.ndarray"]) -> None:
        """Variable/activation histograms into the tfevents stream
        (reference trainer.py:431-432, misc/utils.py:333-346)."""
        if self._tb is not None:
            self._tb.histograms(step, tensors)

    def close(self) -> None:
        self._fp.close()
        if self._tb is not None:
            self._tb.close()


def load_scalars(path: str):
    """Read back an events.jsonl into {tag: [(step, value)]}."""
    out: Dict[str, list] = {}
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            step = rec.pop("step")
            rec.pop("wall", None)
            for k, v in rec.items():
                out.setdefault(k, []).append((step, v))
    return out


@contextmanager
def profile_trace(logdir: str):
    """JAX profiler trace context (open the result with xprof/TensorBoard)."""
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def activation_summaries(endpoints: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Per-endpoint activation stats (misc/utils.py:333-346 equivalent)."""
    out = {}
    for name, x in endpoints.items():
        if not hasattr(x, "dtype") or not jnp.issubdtype(x.dtype, jnp.floating):
            continue
        if getattr(x, "ndim", 0) == 0:
            continue
        out[name + "/mean"] = jnp.mean(x)
        out[name + "/std"] = jnp.std(x)
        out[name + "/zero_frac"] = jnp.mean((x == 0).astype(jnp.float32))
    return out
