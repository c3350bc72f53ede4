"""Committed golden-fixture IO for the reference-parity suite.

The torch-parity tests (tests/test_reference_parity*.py) validate our
model against the ACTUAL reference PyTorch modules when /root/reference
is mounted. Every live run also RECORDS its reference-side payload —
inputs, the reference state_dict (numpy), and the reference outputs —
into ``tests/fixtures/<name>.npz`` so the same numerical evidence
replays when the reference (or torch) is gone:
``tests/test_golden_fixtures.py`` loads these payloads in the quick
tier and runs only our side (SURVEY.md §4: "golden-value parity tests
against captured PyTorch activations").

Fixture format: one compressed npz per scenario; nested dicts are
flattened with "/" (keys must not contain "/"; the reference
state_dict's dotted keys are flat already, so they pass through
unchanged). Refresh by running the full suite with the reference
mounted and committing the changed files.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
# OPZ_REFERENCE points at a reference checkout elsewhere (or at a
# nonexistent path to exercise the fixture-replay branches with the
# mount present)
REF = os.environ.get("OPZ_REFERENCE", "/root/reference")


def reference_mounted() -> bool:
    return os.path.isdir(os.path.join(REF, "src"))


def _flatten(tree: dict, prefix: str = "", out: Dict[str, np.ndarray] = None):
    out = {} if out is None else out
    for k, v in tree.items():
        assert "/" not in k, f"fixture key {k!r} may not contain '/'"
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            _flatten(v, key, out)
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def fixture_path(name: str) -> str:
    return os.path.join(FIXTURE_DIR, f"{name}.npz")


def have_fixture(name: str) -> bool:
    return os.path.exists(fixture_path(name))


def save_fixture(name: str, payload: dict) -> dict:
    """Write (or refresh) a fixture; returns the payload for chaining."""
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    np.savez_compressed(fixture_path(name), **_flatten(payload))
    return payload


def load_fixture(name: str) -> dict:
    with np.load(fixture_path(name)) as z:
        return _unflatten({k: z[k] for k in z.files})


def load_fixture_or_skip(name: str) -> dict:
    if not have_fixture(name):
        import pytest

        pytest.skip(
            f"fixture {name!r} not recorded — run the full suite with "
            f"{REF} mounted to record it"
        )
    return load_fixture(name)


def state_to_numpy(state_dict) -> Dict[str, np.ndarray]:
    """torch Module.state_dict() -> flat {dotted key: np.ndarray}."""
    return {k: v.detach().cpu().numpy() for k, v in state_dict.items()}
