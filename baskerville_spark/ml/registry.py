"""Model registry: versioned, atomically-published model artifacts.

The reference tracks trained models in a Postgres registry table (model
rows + serialized pipeline dirs; SURVEY §2.11 / tasks.py:1522-1540 "save
model dir + registry row"). Here the same contract — immutable versions,
an atomic CURRENT pointer, metadata alongside the artifact — reuses the
engine's snapshot idiom (runtime/state.StateStore: versioned dirs +
os.replace pointer flip; on Iceberg, the snapshot log). Artifacts are
plain ``.npz`` arrays + a JSON metadata file: no pickle, portable across
Python/numpy versions, safe to load from untrusted storage.
"""

from __future__ import annotations

import json
import os
import time
import uuid

import numpy as np

from baskerville_spark.ml.gbm import GBMClassifier
from baskerville_spark.ml.iforest import IsolationForest


def _forest_arrays(m: IsolationForest) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    for i in range(len(m.features)):
        out[f"t{i}_feat"] = m.features[i]
        out[f"t{i}_thr"] = m.thresholds[i]
        out[f"t{i}_left"] = m.lefts[i]
        out[f"t{i}_right"] = m.rights[i]
        out[f"t{i}_size"] = m.sizes[i]
    return out


class ModelStore:
    """Versioned model persistence with an atomic CURRENT pointer."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._ptr = os.path.join(root, "CURRENT")

    def save(self, model: IsolationForest | GBMClassifier, meta: dict | None = None) -> str:
        version = f"v_{int(time.time() * 1000)}_{uuid.uuid4().hex[:6]}"
        path = os.path.join(self.root, version)
        os.makedirs(path)
        if isinstance(model, IsolationForest):
            kind = "iforest"
            arrays = _forest_arrays(model)
            params = {
                "n_trees": len(model.features),
                "psi": model.psi,
                "n_features": model.n_features,
            }
        elif isinstance(model, GBMClassifier):
            kind = "gbm"
            arrays = {
                "feat": model.feat,
                "thr": model.thr,
                "left": model.left,
                "right": model.right,
            }
            params = {
                "bias": model.bias,
                "lr": model.lr,
                "n_features": model.n_features,
            }
        else:
            raise TypeError(f"unknown model type {type(model).__name__}")
        np.savez(os.path.join(path, "arrays.npz"), **arrays)
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(
                {"kind": kind, "params": params, "meta": meta or {}}, f, indent=2
            )
        tmp = self._ptr + f".tmp{uuid.uuid4().hex[:6]}"
        with open(tmp, "w") as f:
            json.dump({"version": version}, f)
        os.replace(tmp, self._ptr)  # atomic publish
        return version

    def versions(self) -> list[str]:
        return sorted(
            d for d in os.listdir(self.root)
            if d.startswith("v_") and os.path.isdir(os.path.join(self.root, d))
        )

    def current_version(self) -> str | None:
        if not os.path.exists(self._ptr):
            return None
        with open(self._ptr) as f:
            return json.load(f)["version"]

    def load(self, version: str | None = None):
        """Load a version (default: CURRENT) → (model, meta dict)."""
        version = version or self.current_version()
        if version is None:
            raise FileNotFoundError("model store is empty")
        path = os.path.join(self.root, version)
        with open(os.path.join(path, "meta.json")) as f:
            doc = json.load(f)
        arrays = np.load(os.path.join(path, "arrays.npz"), allow_pickle=False)
        p = doc["params"]
        if doc["kind"] == "iforest":
            n = p["n_trees"]
            model: IsolationForest | GBMClassifier = IsolationForest(
                [arrays[f"t{i}_feat"] for i in range(n)],
                [arrays[f"t{i}_thr"] for i in range(n)],
                [arrays[f"t{i}_left"] for i in range(n)],
                [arrays[f"t{i}_right"] for i in range(n)],
                [arrays[f"t{i}_size"] for i in range(n)],
                psi=p["psi"],
                n_features=p["n_features"],
            )
        elif doc["kind"] == "gbm":
            model = GBMClassifier(
                p["bias"],
                arrays["feat"],
                arrays["thr"],
                arrays["left"],
                arrays["right"],
                p["lr"],
                p["n_features"],
            )
        else:
            raise ValueError(f"unknown model kind {doc['kind']!r}")
        return model, doc["meta"]
