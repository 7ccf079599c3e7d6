"""Atomic checkpoints: params + optimizer state + log + metadata.

Counterpart of the reference's serialization layer
(``blocks/serialization.py:145-283``: tar archive with ``_parameters``
npz keyed by brick paths, pickled main loop, ``secure_dump`` tmp+rename;
``blocks/extensions/saveload.py:16-103``).  Differences:

* no pickled code objects for the model — parameters are a flat
  ``{'/recognizer/...': array}`` npz (same path-keyed convention, enabling
  the reference's checkpoint-surgery workflows);
* optimizer state is stored as a second path-keyed npz plus a treedef
  pickle; the log and metadata are separate members;
* atomicity via write-to-temp + ``os.replace`` (secure_dump semantics).
"""
from __future__ import annotations

import io
import json
import os
import pickle
import tarfile
import tempfile
from typing import Any, Dict, Mapping, Optional

import jax
import numpy as np

PARAMETERS_MEMBER = "_parameters.npz"
OPT_STATE_MEMBER = "_opt_state.pkl"
LOG_MEMBER = "_log.pkl"
META_MEMBER = "_meta.json"


def _npz_bytes(arrays: Mapping[str, np.ndarray]) -> bytes:
    buf = io.BytesIO()
    np.savez(buf, **{k: np.asarray(v) for k, v in arrays.items()})
    return buf.getvalue()


def secure_write(path: str, writer):
    """Write via temp file + atomic rename (serialization.py:200-227)."""
    dirname = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(dirname, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=dirname, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            writer(f)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def save_checkpoint(path: str, parameters: Mapping[str, np.ndarray],
                    opt_state: Any = None, log_state: Any = None,
                    meta: Optional[Dict] = None):
    """Write a tar checkpoint ('.zip' suffix kept for reference parity)."""

    def writer(f):
        with tarfile.open(fileobj=f, mode="w") as tar:
            def add(name, data: bytes):
                info = tarfile.TarInfo(name)
                info.size = len(data)
                tar.addfile(info, io.BytesIO(data))

            add(PARAMETERS_MEMBER, _npz_bytes(parameters))
            if opt_state is not None:
                host_state = jax.tree.map(np.asarray, opt_state)
                add(OPT_STATE_MEMBER, pickle.dumps(host_state, protocol=4))
            if log_state is not None:
                add(LOG_MEMBER, pickle.dumps(log_state, protocol=4))
            add(META_MEMBER, json.dumps(meta or {}).encode())

    secure_write(path, writer)


def _open_member(path, member):
    with tarfile.open(path, "r") as tar:
        try:
            f = tar.extractfile(member)
        except KeyError:
            return None
        return f.read() if f is not None else None


def load_parameters(path: str) -> Dict[str, np.ndarray]:
    """Load the path-keyed parameter dict from a checkpoint or raw npz."""
    if tarfile.is_tarfile(path):
        data = _open_member(path, PARAMETERS_MEMBER)
        if data is None:
            raise KeyError(f"{path} has no {PARAMETERS_MEMBER}")
        with np.load(io.BytesIO(data)) as npz:
            return {k: npz[k] for k in npz.files}
    with np.load(path) as npz:
        return {k: npz[k] for k in npz.files}


def save_parameters(path: str, parameters: Mapping[str, np.ndarray]):
    secure_write(path, lambda f: f.write(_npz_bytes(parameters)))


def gather_tree(tree):
    """Host-gather a (possibly mesh-sharded) pytree to numpy arrays.

    Single-host meshes (all shards addressable) gather via ``np.asarray``;
    multi-host global arrays go through ``process_allgather`` so every
    process sees the full value (role of the parameter collection in
    ``blocks/serialization.py:145-190``, which had no sharding to undo).
    """
    def gather(leaf):
        if getattr(leaf, "is_fully_addressable", True):
            return np.asarray(leaf)
        from jax.experimental import multihost_utils
        return np.asarray(
            multihost_utils.process_allgather(leaf, tiled=True))
    return jax.tree.map(gather, tree)


def save_sharded_checkpoint(path: str, params, opt_state=None,
                            log_state=None, meta: Optional[Dict] = None):
    """Save from a mesh-sharded train state: gather, then tar.

    The on-disk format is identical to :func:`save_checkpoint` (flat
    path-keyed npz) — checkpoints are mesh-shape agnostic and restore
    into any mesh via :func:`restore_sharded_train_state`.
    """
    from attention_lvcsr_tpu.models.recognizer import param_path_dict
    save_checkpoint(path, param_path_dict(gather_tree(params)),
                    opt_state=gather_tree(opt_state)
                    if opt_state is not None else None,
                    log_state=log_state, meta=meta)


def restore_sharded_train_state(path: str, optimizer, mesh):
    """Load a checkpoint and place it on ``mesh`` (any dp x tp shape).

    Returns ``(params, opt_state)``: parameters are resharded per the
    mesh's partition rules; saved optimizer-state values are placed with
    the shardings a fresh ``optimizer.init`` of the sharded parameters
    would carry (eager ``init`` propagates input shardings), so training
    resumes sharded without a replicated detour.  A checkpoint saved from
    a dp4 x tp2 mesh restores into dp2 x tp4, dp8, or a single device.
    """
    from attention_lvcsr_tpu.models.recognizer import params_from_path_dict
    from attention_lvcsr_tpu.parallel.mesh import shard_params

    state = load_checkpoint(path)
    params = shard_params(params_from_path_dict(state["parameters"]), mesh)
    opt_state = None
    if state["opt_state"] is not None:
        template = optimizer.init(params)
        loaded = state["opt_state"]
        treedef = jax.tree.structure(template)
        if jax.tree.structure(loaded) != treedef:
            raise ValueError(
                "checkpoint optimizer state does not match the optimizer "
                f"(saved {jax.tree.structure(loaded)}, need {treedef})")
        opt_state = jax.tree.map(
            lambda t, v: jax.device_put(np.asarray(v), t.sharding),
            template, loaded)
    return params, opt_state


def load_checkpoint(path: str) -> Dict[str, Any]:
    out: Dict[str, Any] = {"parameters": load_parameters(path)}
    if tarfile.is_tarfile(path):
        opt = _open_member(path, OPT_STATE_MEMBER)
        out["opt_state"] = pickle.loads(opt) if opt else None
        log = _open_member(path, LOG_MEMBER)
        out["log_state"] = pickle.loads(log) if log else None
        meta = _open_member(path, META_MEMBER)
        out["meta"] = json.loads(meta) if meta else {}
    else:
        out["opt_state"] = out["log_state"] = None
        out["meta"] = {}
    return out
