"""Checkpoint/resume with explicit metadata.

Replaces the reference's dict-style torch.save checkpoints *and* its
dir-name metadata channel (hyperparameters parsed back out of folder
names — train.py:148-149, train_nsvae.py:94-121): every checkpoint dir
gets a ``meta.json`` carrying the full model config + training
counters, and tensors go through Orbax (async-capable, TPU-native).

Layout:
  <dir>/meta.json
  <dir>/state/        (orbax pytree: variables, opt states, curves)
  <dir>/best/         (best-val-loss snapshot of the variables)
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional

import jax
import numpy as np


def _to_jsonable(obj):
    if dataclasses.is_dataclass(obj):
        return {k: _to_jsonable(v) for k, v in dataclasses.asdict(obj).items()}
    if isinstance(obj, dict):
        return {k: _to_jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_to_jsonable(v) for v in obj]
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    return obj


class CheckpointManager:
    def __init__(self, directory: str):
        # orbax/tensorstore requires absolute paths; a relative
        # --reload_savedir would otherwise crash on restore.
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        import orbax.checkpoint as ocp

        self._ckptr = ocp.PyTreeCheckpointer()

    # -- metadata ----------------------------------------------------------
    def save_meta(self, meta: dict) -> None:
        with open(os.path.join(self.directory, "meta.json"), "w") as f:
            json.dump(_to_jsonable(meta), f, indent=2, default=str)

    def load_meta(self) -> dict:
        with open(os.path.join(self.directory, "meta.json")) as f:
            return json.load(f)

    # -- tensors -----------------------------------------------------------
    def _save_tree(self, name: str, tree: Any) -> None:
        path = os.path.join(self.directory, name)
        tree = jax.tree.map(np.asarray, tree)
        import orbax.checkpoint as ocp

        self._ckptr.save(path, tree, force=True)

    def _load_tree(self, name: str, like: Optional[Any] = None) -> Any:
        path = os.path.join(self.directory, name)
        if like is None:
            return self._ckptr.restore(path)
        # Restore INTO the template so orbax aligns leaves by tree
        # structure/key names. Zipping restored leaves against the
        # template's flatten order would silently mis-assign whenever
        # the two orders differ (optax namedtuple states restore as
        # dicts whose sorted-key order need not match field order).
        template = jax.tree.map(np.asarray, like)
        restored = self._ckptr.restore(path, item=template)
        return jax.tree.map(
            lambda n, l: np.asarray(n).astype(np.asarray(l).dtype),
            restored, like)

    def save_state(self, state: Any) -> None:
        self._save_tree("state", state)

    def load_state(self, like: Optional[Any] = None) -> Any:
        return self._load_tree("state", like)

    def save_best(self, variables: Any) -> None:
        self._save_tree("best", variables)

    def load_best(self, like: Optional[Any] = None) -> Any:
        return self._load_tree("best", like)

    def has_state(self) -> bool:
        return os.path.exists(os.path.join(self.directory, "state"))

    def has_best(self) -> bool:
        return os.path.exists(os.path.join(self.directory, "best"))


def datanorm_to_meta(datanorm):
    """(mean (F,2), std (F,2)) -> JSON-serializable meta entry (or None).

    Persisting the stats WITH the checkpoint fixes a reference footgun:
    its hyperparameters round-trip through dir names and config mean/std
    paths, and test_prevae.py:549-555 silently rebuilds VAEs without
    data_mean/std, evaluating a datanorm-trained model un-normalized."""
    if datanorm is None:
        return None
    return {"mean": np.asarray(datanorm[0]).tolist(),
            "std": np.asarray(datanorm[1]).tolist()}


def datanorm_from_meta(meta: dict):
    """Inverse of datanorm_to_meta; tolerates pre-datanorm metas."""
    dn = meta.get("datanorm")
    if not dn:
        return None
    return (np.asarray(dn["mean"], np.float32),
            np.asarray(dn["std"], np.float32))
