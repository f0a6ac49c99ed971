"""Flattened BVH device representation.

Replaces the reference's per-backend acceleration structures (rmagine
EmbreeMap / OptixMap / VulkanMap — SURVEY.md §2.9) with ONE layout designed
for the TPU execution model: a single ``(N, 16)`` float32 slot array in HBM,
**preorder-threaded** so that traversal needs *no per-ray stack* — the whole
traversal state is three registers per ray (current link, best distance, best
slot), which is what keeps the lockstep vmapped loop at full vector speed
(per-lane stack scatters measured ~1600x slower than register state on v5e).

Slots are laid out in tree preorder, so depth-first descent walks mostly
forward in memory (gather locality). Every slot is 64 bytes:

  internal node:
    [0:3]  AABB min             [3:6]  AABB max
    [12]   hit link  (int32 bitcast) — preorder next = first child
    [13]   miss link (int32 bitcast) — skip link = next subtree in preorder
    rest unused

  leaf (one triangle inline — no second indirection):
    [0:3]  v0                   [3:6]  e1 = v1 - v0
    [6:9]  e2 = v2 - v0         [9:12] unit geometric normal
    [12]   primitive id (int32 bitcast, original mesh face index)
    [13]   miss link    (int32 bitcast)
    [14]   instance id  (int32 bitcast; 0 for single meshes)
    [15]   unused

Link encoding: ``link >= 0`` → internal slot index; ``link < 0`` → leaf slot
index ``~link``; ``link == SENTINEL_LINK`` → traversal done. Leaf-ness is
known from the link *before* the gather, so internal and leaf steps share one
uniform branchless body.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

SENTINEL_LINK = np.int32(-2147483648)

# word indices within a slot
W_BMIN = 0
W_BMAX = 3
W_V0 = 0
W_E1 = 3
W_E2 = 6
W_NORMAL = 9
W_HIT = 12
W_PRIM = 12
W_MISS = 13
W_INST = 14


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BVH:
    """Device BVH over one triangle mesh (or a flattened scene).

    nodes:     (N, 16) float32 threaded slots (see module docstring)
    root_link: () int32 — link to the root (may itself be a leaf link)
    aabb_min/aabb_max: (3,) float32 scene bounds
    n_tris:    () int32 number of triangles
    """

    nodes: Array
    root_link: Array
    aabb_min: Array
    aabb_max: Array
    n_tris: Array

    @property
    def n_slots(self) -> int:
        return self.nodes.shape[0]

    def nbytes(self) -> int:
        return int(self.nodes.size) * 4


def decode_link(link: Array) -> Tuple[Array, Array]:
    """(is_leaf, slot_index) from a link value."""
    is_leaf = link < 0
    return is_leaf, jnp.where(is_leaf, ~link, link)
