"""Checkpoint store with the reference's model-dir contract.

Layout inside ``<model>/nnet`` (parity with TF Saver + misc/utils.py:217-270):

- ``model-<step>.msgpack``  — full train state (params, batch/loss stats,
  optimizer state, step), flax msgpack serialization.
- ``checkpoint``            — text pointer file, TF-style:
      model_checkpoint_path: "model-<step>"
      all_model_checkpoint_paths: "model-<k>" ...
  ``make_checkpoint``-style best/last selection rewrites only this file.
"""

from __future__ import annotations

import os
import re
from typing import Any, List, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def _ckpt_path(model_dir: str, step: int) -> str:
    return os.path.join(model_dir, "model-%d.msgpack" % step)


def list_steps(model_dir: str) -> List[int]:
    if not os.path.isdir(model_dir):
        return []
    steps = []
    for name in os.listdir(model_dir):
        m = re.match(r"^model-(\d+)\.msgpack$", name)
        if m:
            steps.append(int(m.group(1)))
    return sorted(steps)


def read_pointer(model_dir: str) -> Optional[int]:
    path = os.path.join(model_dir, "checkpoint")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        for line in f:
            m = re.match(r'^model_checkpoint_path: "model-(\d+)"', line.strip())
            if m:
                return int(m.group(1))
    return None


def write_pointer(model_dir: str, step: int) -> None:
    steps = list_steps(model_dir)
    with open(os.path.join(model_dir, "checkpoint"), "w") as f:
        f.write('model_checkpoint_path: "model-%d"\n' % step)
        for s in steps:
            f.write('all_model_checkpoint_paths: "model-%d"\n' % s)


def save_checkpoint(model_dir: str, state: Any, step: int, keep_max: int = 0) -> str:
    """Serialize the train state; prune old checkpoints beyond keep_max."""
    os.makedirs(model_dir, exist_ok=True)
    host_state = jax.tree.map(np.asarray, serialization.to_state_dict(state))
    path = _ckpt_path(model_dir, step)
    with open(path + ".tmp", "wb") as f:
        f.write(serialization.msgpack_serialize(host_state))
    os.replace(path + ".tmp", path)
    if keep_max and keep_max > 0:
        steps = list_steps(model_dir)
        for s in steps[:-keep_max]:
            os.remove(_ckpt_path(model_dir, s))
    write_pointer(model_dir, step)
    return path


def load_checkpoint(
    model_dir: str, target: Any = None, step: Optional[int] = None
) -> Tuple[Any, int]:
    """Load the pointed-to (or given-step) checkpoint.

    With ``target`` the result has the target's pytree structure; without it
    a raw nested dict is returned.
    """
    if step is None:
        step = read_pointer(model_dir)
    if step is None:
        steps = list_steps(model_dir)
        if not steps:
            raise FileNotFoundError("No checkpoint in %s" % model_dir)
        step = steps[-1]
    with open(_ckpt_path(model_dir, step), "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    if target is not None:
        return serialization.from_state_dict(target, raw), step
    return raw, step


def select_checkpoint(model_dir: str, checkpoint: str | int = "last",
                      write: bool = True) -> int:
    """Resolve "last" / step-id / "-1" (best by valid_loss) to a step and
    rewrite the pointer (reference misc/utils.py:217-270 + make_checkpoint.py).
    ``write=False`` resolves only, leaving the model dir untouched (read-only
    consumers like the checkpoint exporter).

    "best" reads ``<model_dir>/../valid_loss`` lines "epoch loss eer" and maps
    the best epoch to step best_epoch*num_steps_per_epoch — correct for this
    repo's 1-based epochs in valid_loss (cli/train.py writes epoch+1). NOTE: a
    valid_loss file written by the reference uses 0-based epochs (its best
    step is (epoch+1)*num_steps, misc/utils.py:243-258), so "best" against a
    reference-produced model dir resolves one epoch early; the
    closest-existing-checkpoint fallback below then snaps to a neighbor.
    """
    steps = list_steps(model_dir)
    if not steps:
        raise FileNotFoundError("No checkpoints in %s" % model_dir)
    if checkpoint in ("last", -1, "-1", "best") or isinstance(checkpoint, str):
        if checkpoint in ("-1", -1, "best"):
            valid_loss_path = os.path.join(os.path.dirname(model_dir), "valid_loss")
            if not os.path.exists(valid_loss_path):
                valid_loss_path = os.path.join(model_dir, "valid_loss")
            best_epoch, best_loss = None, None
            with open(valid_loss_path) as f:
                for line in f:
                    parts = line.split()
                    epoch, loss = int(parts[0]), float(parts[1])
                    if best_loss is None or loss < best_loss:
                        best_epoch, best_loss = epoch, loss
            import json

            cfg_path = os.path.join(model_dir, "config.json")
            with open(cfg_path) as f:
                num_steps = json.load(f)["num_steps_per_epoch"]
            step = best_epoch * num_steps
            # fall back to the closest existing checkpoint
            step = min(steps, key=lambda s: abs(s - step))
        elif checkpoint == "last":
            step = steps[-1]
        else:
            step = int(checkpoint)
    else:
        step = int(checkpoint)
    assert step in steps, "checkpoint model-%d not found" % step
    if write:
        write_pointer(model_dir, step)
    return step
