"""JSON config system.

Behavioral equivalent of the reference's ``misc/utils.py:13-61`` (``Params`` /
``ParamsPlain``): a JSON file becomes an attribute object, presence-based
defaulting is done via ``"key" in params.dict`` and unknown keys are tolerated,
so the public ``nnet_conf/*.json`` configs run unchanged.
"""

from __future__ import annotations

import json
from typing import Any, Dict


class Params:
    """Loads hyperparameters from a JSON file into attributes.

    Example::

        params = Params("config.json")
        lr = params.learning_rate
        if "pooling_type" in params.dict: ...
        params.dict["new_key"] = 1     # runtime mutation, like the reference
    """

    def __init__(self, json_path: str):
        with open(json_path) as f:
            self.__dict__.update(json.load(f))

    def save(self, json_path: str) -> None:
        with open(json_path, "w") as f:
            json.dump(
                {k: v for k, v in self.__dict__.items() if _is_jsonable(v)},
                f,
                indent=4,
                sort_keys=True,
            )

    def update(self, json_path: str) -> None:
        """Overlay parameters from another JSON file."""
        with open(json_path) as f:
            self.__dict__.update(json.load(f))

    @property
    def dict(self) -> Dict[str, Any]:
        """Dict-style access, e.g. ``params.dict["learning_rate"]``."""
        return self.__dict__

    def __contains__(self, key: str) -> bool:
        return key in self.__dict__

    def __repr__(self) -> str:  # pragma: no cover
        return "Params(%s)" % ", ".join(sorted(self.__dict__))


class ParamsPlain(Params):
    """An empty Params, filled programmatically (used heavily in tests)."""

    def __init__(self, **kwargs):
        self.__dict__.update(kwargs)


def _is_jsonable(x: Any) -> bool:
    try:
        json.dumps(x)
        return True
    except (TypeError, ValueError):
        return False


def remove_params_prefix(params: Params, prefix: str) -> ParamsPlain:
    """Strip ``<prefix>_`` from keys (multitask ``spk_``/``phn_`` configs).

    Mirrors reference misc/utils.py:349-366: a key ``spk_loss_func`` becomes
    ``loss_func`` in the returned object; keys without the prefix are kept.
    """
    new = ParamsPlain()
    pre = prefix if prefix.endswith("_") else prefix + "_"
    for k, v in params.dict.items():
        if k.startswith(pre):
            new.dict[k[len(pre):]] = v
        else:
            new.dict.setdefault(k, v)
    return new
