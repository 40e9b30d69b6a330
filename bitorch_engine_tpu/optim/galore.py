"""GaLore low-rank gradient projector (pure JAX).

Parity: ``optim/galore_projector.py:17-124`` — an orthonormal projection
matrix derived from the SVD of the gradient, refreshed every
``update_proj_gap`` steps; gradients are projected to rank-r space for the
optimizer moments and projected back before the weight update.

TPU-native notes: the SVD runs under jit via ``jnp.linalg.svd`` on fp32; the
refresh is a ``lax.cond`` so the step stays a single compiled function.
Orientation follows the reference 'std' rule exactly
(``galore_projector.py:28-37``): tall-or-square gradients
(``shape[0] >= shape[1]``) project RIGHT (``g @ ortho.T``, compressing the
column space); wide gradients project LEFT.  Pinned by
``tests/test_galore.py::test_orientation_matches_reference_std_rule``.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array


@struct.dataclass
class GaLoreState:
    ortho: Array  # (rank, m) or (n, rank) depending on orientation
    right: bool = struct.field(pytree_node=False, default=True)


@struct.dataclass
class GaLoreConfig:
    rank: int = struct.field(pytree_node=False, default=128)
    update_proj_gap: int = struct.field(pytree_node=False, default=200)
    scale: float = struct.field(pytree_node=False, default=0.25)


def _orthogonal_factor(grad: Array, rank: int, right: bool) -> Array:
    g32 = grad.astype(jnp.float32)
    u, s, vh = jnp.linalg.svd(g32, full_matrices=False)
    if right:
        return vh[:rank, :]  # (rank, n)
    return u[:, :rank]  # (m, rank)


def galore_init(grad_shape, rank: int) -> GaLoreState:
    m, n = grad_shape
    right = m >= n  # reference 'std' rule, galore_projector.py:28-37
    if right:
        ortho = jnp.zeros((min(rank, n), n), jnp.float32)
    else:
        ortho = jnp.zeros((m, min(rank, m)), jnp.float32)
    return GaLoreState(ortho=ortho, right=right)


def galore_project(state: GaLoreState, grad: Array, step: Array, cfg: GaLoreConfig):
    """Returns (projected_grad, new_state); refreshes the SVD factor on schedule."""
    rank = state.ortho.shape[0] if state.right else state.ortho.shape[1]
    # refresh on schedule OR while uninitialized (all-zero ortho) — the
    # reference refreshes when ``ortho_matrix is None`` too
    # (galore_projector.py:30); without this the first gap-1 steps would
    # project every gradient to zero
    refresh = ((step % cfg.update_proj_gap) == 0) | ~jnp.any(state.ortho != 0)

    def do_refresh(_):
        return _orthogonal_factor(grad, rank, state.right)

    ortho = jax.lax.cond(refresh, do_refresh, lambda _: state.ortho, None)
    g32 = grad.astype(jnp.float32)
    if state.right:
        proj = g32 @ ortho.T  # (m, rank)
    else:
        proj = ortho.T @ g32  # (rank, n)
    return proj, state.replace(ortho=ortho)


def galore_project_back(state: GaLoreState, low_rank_grad: Array, cfg: GaLoreConfig) -> Array:
    if state.right:
        full = low_rank_grad @ state.ortho
    else:
        full = state.ortho @ low_rank_grad
    return full * cfg.scale
