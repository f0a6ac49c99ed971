"""Mesh file IO: loaders for OBJ/STL/PLY(ascii+binary)/OFF.

The reference delegates to Assimp (rmagine import_embree_map etc.,
SURVEY.md §2.9); these loaders are the TPU build's equivalent surface.
"""

import struct

import numpy as np

from rmcl_tpu.geom.mesh import (
    TriangleMesh,
    load_mesh,
    load_ply,
    make_box,
    save_obj,
)


def _box():
    return make_box(size=(2.0, 1.0, 3.0), center=(0.5, -0.25, 1.0))


def _sorted_tris(mesh: TriangleMesh) -> np.ndarray:
    t = mesh.triangles().reshape(-1, 9).round(5)
    order = np.lexsort(t.T)
    return t[order]


def _write_ply_ascii(path, verts, faces):
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\ncomment test\n")
        f.write(f"element vertex {len(verts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(faces)}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        for v in verts:
            f.write(f"{v[0]} {v[1]} {v[2]}\n")
        for fc in faces:
            f.write(f"{len(fc)} " + " ".join(str(i) for i in fc) + "\n")


def _write_ply_binary(path, verts, faces, endian="<"):
    fmt = "binary_little_endian" if endian == "<" else "binary_big_endian"
    with open(path, "wb") as f:
        hdr = (
            f"ply\nformat {fmt} 1.0\n"
            f"element vertex {len(verts)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            f"element face {len(faces)}\n"
            "property list uchar int vertex_indices\nend_header\n"
        )
        f.write(hdr.encode())
        for v in verts:
            f.write(struct.pack(endian + "3f", *v))
        for fc in faces:
            f.write(struct.pack(endian + "B", len(fc)))
            f.write(struct.pack(f"{endian}{len(fc)}i", *fc))


def test_obj_roundtrip(tmp_path):
    mesh = _box()
    p = str(tmp_path / "box.obj")
    save_obj(mesh, p)
    back = load_mesh(p)
    np.testing.assert_allclose(_sorted_tris(back), _sorted_tris(mesh), atol=1e-5)


def test_ply_ascii(tmp_path):
    mesh = _box()
    p = str(tmp_path / "box.ply")
    _write_ply_ascii(p, mesh.vertices, mesh.faces.tolist())
    back = load_mesh(p)
    np.testing.assert_allclose(_sorted_tris(back), _sorted_tris(mesh), atol=1e-5)


def test_ply_binary_little(tmp_path):
    mesh = _box()
    p = str(tmp_path / "box_le.ply")
    _write_ply_binary(p, mesh.vertices, mesh.faces.tolist(), "<")
    back = load_ply(p)
    np.testing.assert_allclose(_sorted_tris(back), _sorted_tris(mesh), atol=1e-5)


def test_ply_binary_big(tmp_path):
    mesh = _box()
    p = str(tmp_path / "box_be.ply")
    _write_ply_binary(p, mesh.vertices, mesh.faces.tolist(), ">")
    back = load_ply(p)
    np.testing.assert_allclose(_sorted_tris(back), _sorted_tris(mesh), atol=1e-5)


def test_ply_binary_quads_fan(tmp_path):
    # unit square split as one quad -> two fan triangles
    verts = np.asarray(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32
    )
    p = str(tmp_path / "quad.ply")
    _write_ply_binary(p, verts, [[0, 1, 2, 3]])
    back = load_ply(p)
    assert back.n_faces == 2
    assert np.isclose(back.face_areas().sum(), 1.0)


def test_ply_binary_ragged_lists(tmp_path):
    # mixed tri + quad faces forces the ragged scan path
    verts = np.asarray(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0], [0, 0, 1]], np.float32
    )
    p = str(tmp_path / "ragged.ply")
    _write_ply_binary(p, verts, [[0, 1, 2, 3], [0, 1, 4]])
    back = load_ply(p)
    assert back.n_faces == 3


def test_ply_binary_extra_vertex_props(tmp_path):
    # vertices carry normals + color; loader must stride past them
    mesh = _box()
    p = str(tmp_path / "rich.ply")
    with open(p, "wb") as f:
        hdr = (
            "ply\nformat binary_little_endian 1.0\n"
            f"element vertex {mesh.n_vertices}\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property float nx\nproperty float ny\nproperty float nz\n"
            "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            f"element face {mesh.n_faces}\n"
            "property list uchar uint vertex_indices\nend_header\n"
        )
        f.write(hdr.encode())
        for v in mesh.vertices:
            f.write(struct.pack("<6f3B", *v, 0.0, 0.0, 1.0, 255, 0, 0))
        for fc in mesh.faces:
            f.write(struct.pack("<B3I", 3, *fc))
    back = load_ply(p)
    np.testing.assert_allclose(_sorted_tris(back), _sorted_tris(mesh), atol=1e-5)
