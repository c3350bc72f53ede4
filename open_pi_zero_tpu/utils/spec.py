"""ModuleSpec: a JSON-serializable callable reference `module:name` with
bound args/kwargs (reference src/utils/spec.py:6-76; used by the data layer
to name standardize/filter functions inside configs)."""

from __future__ import annotations

import importlib
from functools import partial
from typing import Callable, Dict, Union

KEYS = {"module", "name", "args", "kwargs"}


def create(callable_or_full_name: Union[str, Callable], *args, **kwargs) -> Dict:
    if isinstance(callable_or_full_name, str):
        if callable_or_full_name.count(":") != 1:
            raise ValueError(
                "expected fully qualified import string 'pkg.module:Name', "
                f"got {callable_or_full_name!r}"
            )
        module, name = callable_or_full_name.split(":")
    else:
        o = callable_or_full_name
        if not (hasattr(o, "__module__") and hasattr(o, "__name__")):
            raise ValueError(f"cannot infer import path of {o!r}")
        module, name = o.__module__, o.__name__
    return {"module": module, "name": name, "args": args, "kwargs": kwargs}


def instantiate(spec: Dict) -> Callable:
    if set(spec.keys()) != KEYS:
        raise ValueError(f"expected ModuleSpec with keys {KEYS}, got {spec}")
    obj = getattr(importlib.import_module(spec["module"]), spec["name"])
    return partial(obj, *spec["args"], **spec["kwargs"])


def to_string(spec: Dict) -> str:
    args = ", ".join(map(str, spec["args"]))
    kwargs = ", ".join(f"{k}={v}" for k, v in spec["kwargs"].items())
    sep = ", " if args and kwargs else ""
    return f"{spec['module']}:{spec['name']}({args}{sep}{kwargs})"
