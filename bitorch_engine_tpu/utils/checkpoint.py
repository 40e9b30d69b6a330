"""Checkpoint save/load for QTensor pytrees (Orbax).

Parity targets: ``save_checkpoint`` / ``load_checkpoint``
(``utils/model_helper.py:238-283``) — pack-then-save protocol — and the MPQ
re-hydration contract (``prepare_params`` after load,
``nbit/layer.py:494-511``).

TPU-native: Orbax handles sharded arrays natively, so the same checkpoint
round-trips on any mesh.  QTensor static metadata (w_bit, group_size,
layout, asym, code_bits, ...) rides in the pytree structure; it is
persisted alongside the arrays as a JSON spec (``qtensor_spec.json``
inside the checkpoint directory), so ``load_checkpoint(path)`` with no
template rebuilds the full pytree — the tolerant-restore role of the
reference's ``MBWQLinearCuda.load_state_dict`` (``mbwq_layer.py:205-237``).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp

from .convert import prepare_for_inference
from .. import qtensor as qt_mod
from ..qtensor import QTensorBase

_SPEC_NAME = "qtensor_spec.json"

# QTensor classes restorable by name (anything subclassing QTensorBase in
# the qtensor module)
_QT_REGISTRY = {
    name: obj
    for name, obj in vars(qt_mod).items()
    if isinstance(obj, type) and issubclass(obj, QTensorBase) and obj is not QTensorBase
}


def _spec_of(obj) -> Any:
    """Pytree → JSON-able structure spec (arrays become shape/dtype stubs)."""
    if obj is None:
        return {"__none__": True}
    if isinstance(obj, QTensorBase):
        fields = {}
        for f in dataclasses.fields(obj):
            v = getattr(obj, f.name)
            if f.metadata.get("pytree_node", True):
                fields[f.name] = _spec_of(v)
            else:
                fields[f.name] = {"__static__": v}
        return {"__qtensor__": type(obj).__name__, "fields": fields}
    if isinstance(obj, dict):
        return {"__dict__": {k: _spec_of(v) for k, v in obj.items()}}
    if isinstance(obj, (tuple, list)):
        return {
            "__seq__": [_spec_of(v) for v in obj],
            "tuple": isinstance(obj, tuple),
        }
    if hasattr(obj, "shape") and hasattr(obj, "dtype"):
        return {"__array__": {"shape": list(obj.shape), "dtype": str(obj.dtype)}}
    # plain python leaf (int/float/str/bool) — restored verbatim
    return {"__static__": obj}


def _template_of(spec) -> Any:
    """Structure spec → abstract pytree (ShapeDtypeStruct leaves) for
    Orbax restore."""
    if "__none__" in spec:
        return None
    if "__qtensor__" in spec:
        cls = _QT_REGISTRY[spec["__qtensor__"]]
        kwargs = {}
        for name, sub in spec["fields"].items():
            kwargs[name] = (
                sub["__static__"] if "__static__" in sub else _template_of(sub)
            )
        return cls(**kwargs)
    if "__dict__" in spec:
        return {k: _template_of(v) for k, v in spec["__dict__"].items()}
    if "__seq__" in spec:
        seq = [_template_of(v) for v in spec["__seq__"]]
        return tuple(seq) if spec.get("tuple") else seq
    if "__array__" in spec:
        a = spec["__array__"]
        return jax.ShapeDtypeStruct(tuple(a["shape"]), jnp.dtype(a["dtype"]))
    return spec["__static__"]


def save_checkpoint(path: str, params, pack: bool = True) -> None:
    """Save a params pytree; ``pack=True`` mirrors the reference's
    pack-then-save (qweight_only) protocol (model_helper.py:238-263).
    A JSON structure spec is written into the checkpoint directory so the
    restore needs no template model."""
    if pack:
        params = prepare_for_inference(params)
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()
    with open(os.path.join(path, _SPEC_NAME), "w") as f:
        json.dump(_spec_of(params), f)


def load_checkpoint(path: str, template: Optional[Any] = None) -> Any:
    """Restore a params pytree.

    With ``template`` (a matching pytree of arrays or ShapeDtypeStructs)
    the QTensor static fields come from the template — the reference's
    pack_bie_layers-before-load shape instantiation (model_helper.py:
    266-283).  Without one, the structure is rebuilt from the
    ``qtensor_spec.json`` the save wrote (template-free restore)."""
    path = os.path.abspath(path)
    if template is None:
        spec_path = os.path.join(path, _SPEC_NAME)
        if not os.path.exists(spec_path):
            raise FileNotFoundError(
                f"no template given and no {_SPEC_NAME} in {path} (checkpoint "
                "written by a pre-spec version?) — pass a template pytree"
            )
        with open(spec_path) as f:
            template = _template_of(json.load(f))
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, template)
