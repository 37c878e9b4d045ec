"""Model key + registry cache O32/O39 (SURVEY §2.10, §4 P7).

Reference: ``gordo_components/builder/build_model.py::calculate_model_key``
and ``::check_cache`` — the machine config canonicalizes to JSON, its
sha256 is the model key, and a registry hit skips the rebuild entirely.
This is job-level memoization no query optimizer provides; it lives
driver-side.
"""

from __future__ import annotations

import hashlib
import json
import os
import pickle
from typing import Any


def calculate_model_key(machine_config: dict) -> str:
    """sha256 of the canonical (sorted-keys, compact) JSON config — any
    semantic config change changes the key; formatting doesn't."""
    canonical = json.dumps(machine_config, sort_keys=True, separators=(",", ":"), default=str)
    return hashlib.sha256(canonical.encode("utf-8")).hexdigest()


class ModelRegistry:
    """Content-addressed model store: ``<root>/<model_key>/model.pkl`` +
    ``metadata.json`` (O6 model sink; D8 registry)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _dir(self, key: str) -> str:
        return os.path.join(self.root, key)

    def check_cache(self, machine_config: dict) -> str | None:
        key = calculate_model_key(machine_config)
        return key if os.path.exists(os.path.join(self._dir(key), "model.pkl")) else None

    def dump(self, machine_config: dict, model: Any, metadata: dict | None = None) -> str:
        # atomic tmp-file + rename (review r6, same discipline as the
        # corpus artifact caches): check_cache trusts model.pkl's
        # existence, so a crashed or concurrent writer must never leave
        # a torn pickle under the content-addressed key
        key = calculate_model_key(machine_config)
        d = self._dir(key)
        os.makedirs(d, exist_ok=True)
        blob_tmp = os.path.join(d, f".model.pkl.tmp.{os.getpid()}")
        with open(blob_tmp, "wb") as f:
            pickle.dump(model, f)
        meta = {"model_key": key, "machine_config": machine_config, **(metadata or {})}
        meta_tmp = os.path.join(d, f".metadata.json.tmp.{os.getpid()}")
        with open(meta_tmp, "w") as f:
            json.dump(meta, f, indent=2, sort_keys=True, default=str)
        # metadata first: a reader that sees model.pkl may immediately
        # read metadata.json, so the pickle lands last
        os.replace(meta_tmp, os.path.join(d, "metadata.json"))
        os.replace(blob_tmp, os.path.join(d, "model.pkl"))
        return key

    def load(self, key: str) -> Any:
        with open(os.path.join(self._dir(key), "model.pkl"), "rb") as f:
            return pickle.load(f)

    def load_metadata(self, key: str) -> dict:
        with open(os.path.join(self._dir(key), "metadata.json")) as f:
            return json.load(f)
