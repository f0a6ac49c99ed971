"""Flattened BVH device representation.

Replaces the reference's per-backend acceleration structures (rmagine
EmbreeMap / OptixMap / VulkanMap — SURVEY.md §2.9) with ONE layout designed
for TPU memory systems: a single ``(N, 16)`` float32 slot array in HBM where
every traversal step costs exactly one 64-byte gather.

Slot layouts (16 float32 words):

  internal node:
    [0:3]  child0 AABB min      [3:6]  child0 AABB max
    [6:9]  child1 AABB min      [9:12] child1 AABB max
    [12]   child0 link (int32 bitcast)
    [13]   child1 link (int32 bitcast)
    [14:16] unused

  leaf (one triangle inline — no second indirection to a primitive array):
    [0:3]  v0                   [3:6]  e1 = v1 - v0
    [6:9]  e2 = v2 - v0         [9:12] unit geometric normal
    [12]   primitive id (int32 bitcast, index into the source mesh faces)
    [13]   instance id (int32 bitcast; 0 for single meshes)
    [14:16] unused

Link encoding: ``link >= 0`` → internal slot index; ``link < 0`` → leaf slot
index ``~link``. The traversal kernel learns leaf-ness from the link *before*
gathering, so internal and leaf fetches share one uniform code path
(branchless select of two interpretations of the same 64 bytes).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# word indices within a slot
W_C0MIN = 0
W_C0MAX = 3
W_C1MIN = 6
W_C1MAX = 9
W_LINK0 = 12
W_LINK1 = 13
W_V0 = 0
W_E1 = 3
W_E2 = 6
W_NORMAL = 9
W_PRIM = 12
W_INST = 13


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BVH:
    """Device BVH over one triangle mesh (or a flattened scene).

    nodes:     (N, 16) float32 unified slots (see module docstring)
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


def encode_leaf_link(slot: np.ndarray) -> np.ndarray:
    return ~slot
