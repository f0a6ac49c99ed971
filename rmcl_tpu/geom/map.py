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
        bin_size: Optional[int] = None,
        bins_per_super: int = 64,
        supers_per_hyper: int = 8,
    ) -> "MeshMap":
        if bin_size is None:
            # bin size must scale with tessellation: fixed 64-tri bins at
            # 10M faces are ~10x finer than a ray block's footprint and
            # saturate any candidate budget (silent false misses — see
            # TPU_NOTES 10M audit). Keep bins' surface area roughly
            # constant: B ~ 64 * (F/1M)^? — measured lossless points are
            # 64 @ <=2M and 512 @ 10M; interpolate by powers of two.
            # halving (not /3) reaches the audited anchors: 64 @ <=2M,
            # 128 @ <=4M, 256 @ <=8M, 512 @ 10M (the /3 loop left maps
            # near 10M at an un-audited 256 whose budgets can saturate)
            f = mesh.n_faces
            bin_size = 64
            while f > 2_000_000 and bin_size < 512:
                bin_size *= 2
                f //= 2
        return MeshMap(
            mesh=mesh,
            bvh=build_bvh(mesh),
            bins=build_bins(mesh, bin_size=bin_size,
                            bins_per_super=bins_per_super,
                            supers_per_hyper=supers_per_hyper),
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
