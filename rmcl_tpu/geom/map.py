"""Map containers: mesh + acceleration structures under one handle.

Equivalent of the reference's per-backend maps and the shared ``MapMap``
name→map container (rmagine EmbreeMap/OptixMap + ``import_*_map`` —
SURVEY.md §2.9, reference micp_localization.cpp:187-195,
rmcl_localization.cpp:22). One ``MeshMap`` carries BOTH device structures:

  * ``bvh``  — threaded BVH for exact traversal / closest-point queries
  * ``bins`` — triangle bins for the dense (gather-free) caster

so pipelines pick the engine per query type without re-importing geometry.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

from rmcl_tpu.bvh.bins import TriangleBins, build_bins
from rmcl_tpu.bvh.builder import build_bvh
from rmcl_tpu.bvh.types import BVH
from rmcl_tpu.geom.mesh import TriangleMesh, load_mesh


@dataclasses.dataclass
class MeshMap:
    """A loaded map: host mesh + device acceleration structures."""

    mesh: TriangleMesh
    bvh: BVH
    bins: TriangleBins
    name: str = "map"

    @staticmethod
    def from_mesh(
        mesh: TriangleMesh,
        name: Optional[str] = None,
        bin_size: int = 64,
        bins_per_super: int = 64,
    ) -> "MeshMap":
        return MeshMap(
            mesh=mesh,
            bvh=build_bvh(mesh),
            bins=build_bins(mesh, bin_size=bin_size, bins_per_super=bins_per_super),
            name=name or mesh.name,
        )

    @staticmethod
    def from_file(path: str, **kwargs) -> "MeshMap":
        """``import_*_map`` equivalent — one import serves all engines."""
        return MeshMap.from_mesh(load_mesh(path), **kwargs)


class MapContainer:
    """Name→map registry shared between pipelines (reference ``MapMap``:
    plugins lazily import maps keyed 'name.embree'/'name.optix' — here one
    entry serves every engine)."""

    def __init__(self) -> None:
        self._maps: Dict[str, MeshMap] = {}

    def load(self, name: str, path_or_mesh) -> MeshMap:
        if name not in self._maps:
            if isinstance(path_or_mesh, TriangleMesh):
                self._maps[name] = MeshMap.from_mesh(path_or_mesh, name=name)
            else:
                self._maps[name] = MeshMap.from_file(path_or_mesh, name=name)
        return self._maps[name]

    def get(self, name: str) -> MeshMap:
        return self._maps[name]

    def __contains__(self, name: str) -> bool:
        return name in self._maps
