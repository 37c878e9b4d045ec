"""Workflow config loader — §3.4 restated without Kubernetes.

Reference: ``gordo_components/workflow/`` — a project YAML of N machines
normalizes (defaults merge + validation) into a machine list that the
workflow generator renders to Argo pods, one build per machine.  On
Spark no CRD codegen is needed: the normalized machine list either
drives ``builder.ModelBuilder`` per machine or becomes the config side
of the ``ml/islands.py`` grouped-map train (parallelism across machines
is task scheduling, not pod scheduling).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import yaml

_DNS1035 = re.compile(r"^[a-z]([-a-z0-9]*[a-z0-9])?$")

DEFAULT_GLOBALS: dict = {
    "dataset": {"resolution": "10T", "aggregation_methods": "mean"},
    "model": None,  # filled from ml.islands.DEFAULT_MODEL_DEFINITION lazily
    "evaluation": {"cv_mode": "full_build", "n_splits": 3},
}


class ConfigError(ValueError):
    """Invalid workflow/machine configuration."""


@dataclass
class Machine:
    """D4 config unit (reference NormalizedConfig machine element)."""

    name: str
    dataset: dict
    model: dict
    evaluation: dict = field(default_factory=dict)
    metadata: dict = field(default_factory=dict)

    def as_config(self) -> dict:
        return {
            "name": self.name,
            "dataset": self.dataset,
            "model": self.model,
            "evaluation": self.evaluation,
        }


def _merge(base: dict, override: dict) -> dict:
    out = dict(base)
    for k, v in (override or {}).items():
        out[k] = _merge(out[k], v) if isinstance(v, dict) and isinstance(out.get(k), dict) else v
    return out


def load_config(yaml_text: str) -> list[Machine]:
    """Project YAML → normalized machine list (defaults merge, DNS-1035
    name validation — the reference rejects invalid machine names at
    config time because they become k8s resource names)."""
    from gordo_components_spark.ml.islands import DEFAULT_MODEL_DEFINITION

    raw = yaml.safe_load(yaml_text)
    if not isinstance(raw, dict) or "machines" not in raw:
        raise ConfigError("config must be a mapping with a 'machines' list")
    globals_cfg = _merge(DEFAULT_GLOBALS, raw.get("globals", {}))
    if globals_cfg.get("model") is None:
        globals_cfg["model"] = DEFAULT_MODEL_DEFINITION

    machines: list[Machine] = []
    seen: set[str] = set()
    for m in raw["machines"]:
        if "name" not in m:
            raise ConfigError(f"machine missing name: {m!r}")
        name = m["name"]
        if not _DNS1035.match(name) or len(name) > 63:
            raise ConfigError(
                f"machine name {name!r} must be DNS-1035 (lowercase alphanumeric/-, "
                "start with a letter, ≤63 chars)"
            )
        if name in seen:
            raise ConfigError(f"duplicate machine name {name!r}")
        seen.add(name)
        if "dataset" not in m or "tags" not in m["dataset"]:
            raise ConfigError(f"machine {name!r} needs dataset.tags")
        machines.append(
            Machine(
                name=name,
                dataset=_merge(globals_cfg["dataset"], m["dataset"]),
                model=m.get("model") or globals_cfg["model"],
                evaluation=_merge(globals_cfg["evaluation"], m.get("evaluation", {})),
                metadata=m.get("metadata", {}),
            )
        )
    return machines
