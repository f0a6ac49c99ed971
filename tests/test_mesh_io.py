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


_DAE_DOC = """<?xml version="1.0" encoding="utf-8"?>
<COLLADA xmlns="http://www.collada.org/2005/11/COLLADASchema" version="1.4.1">
  <asset><unit name="centimeter" meter="0.01"/><up_axis>Y_UP</up_axis></asset>
  <library_geometries>
    <geometry id="tri_geom"><mesh>
      <source id="tri_pos">
        <float_array id="tri_pos_arr" count="9">0 0 0 100 0 0 0 100 0</float_array>
        <technique_common><accessor source="#tri_pos_arr" count="3" stride="3">
          <param name="X" type="float"/><param name="Y" type="float"/><param name="Z" type="float"/>
        </accessor></technique_common>
      </source>
      <source id="tri_nrm">
        <float_array id="tri_nrm_arr" count="3">0 0 1</float_array>
      </source>
      <vertices id="tri_verts"><input semantic="POSITION" source="#tri_pos"/></vertices>
      <triangles count="1">
        <input semantic="VERTEX" source="#tri_verts" offset="0"/>
        <input semantic="NORMAL" source="#tri_nrm" offset="1"/>
        <p>0 0 1 0 2 0</p>
      </triangles>
    </mesh></geometry>
    <geometry id="quad_geom"><mesh>
      <source id="q_pos">
        <float_array id="q_pos_arr" count="12">0 0 0 100 0 0 100 100 0 0 100 0</float_array>
        <technique_common><accessor source="#q_pos_arr" count="4" stride="3"/></technique_common>
      </source>
      <vertices id="q_verts"><input semantic="POSITION" source="#q_pos"/></vertices>
      <polylist count="1">
        <input semantic="VERTEX" source="#q_verts" offset="0"/>
        <vcount>4</vcount>
        <p>0 1 2 3</p>
      </polylist>
    </mesh></geometry>
  </library_geometries>
  <library_visual_scenes>
    <visual_scene id="scene">
      <node id="n1">
        <translate>100 0 0</translate>
        <instance_geometry url="#tri_geom"/>
        <node id="n2">
          <matrix>1 0 0 0  0 1 0 100  0 0 1 0  0 0 0 1</matrix>
          <instance_geometry url="#tri_geom"/>
        </node>
      </node>
    </visual_scene>
  </library_visual_scenes>
</COLLADA>
"""


def test_dae_loader(tmp_path):
    """COLLADA: triangles + polylist, node transforms, unit scale, Y_UP."""
    from rmcl_tpu.geom.mesh import load_dae

    p = str(tmp_path / "scene.dae")
    with open(p, "w") as f:
        f.write(_DAE_DOC)
    mesh = load_mesh(p)
    # 2 placed instances of the triangle + the never-instanced quad (2 tris)
    assert mesh.n_faces == 4
    tris = mesh.triangles()
    # instance 1: translate (100,0,0) cm -> (1,0,0) m, then Y_UP->Z_UP:
    # file (x,y,z) -> world (x,-z,y): first vertex (1,0,0)->(1,0,0)
    v0 = tris[0, 0]
    np.testing.assert_allclose(v0, [1.0, 0.0, 0.0], atol=1e-6)
    # file vertex (1+1, 0, 0)? second vertex (100+100,0,0)cm=(2,0,0)->(2,0,0)
    np.testing.assert_allclose(tris[0, 1], [2.0, 0.0, 0.0], atol=1e-6)
    # third vertex (1, 1, 0)_file -> (1, 0, 1)_zup
    np.testing.assert_allclose(tris[0, 2], [1.0, 0.0, 1.0], atol=1e-6)
    # instance 2: nested matrix translate +100 in file-y on top of n1:
    # first vertex (1, 1, 0)_file -> (1, 0, 1)_zup
    np.testing.assert_allclose(tris[1, 0], [1.0, 0.0, 1.0], atol=1e-6)
    # quad fan-triangulated: 2 faces, area = 1 m^2 total after scaling
    areas = mesh.face_areas()
    np.testing.assert_allclose(areas[2:].sum(), 1.0, atol=1e-5)


def test_ply_tristrips(tmp_path):
    """tristrips elements expand as strips (alternating winding, -1
    restarts), not fans."""
    ply = b"""ply
format ascii 1.0
element vertex 5
property float x
property float y
property float z
element tristrips 1
property list uchar int vertex_indices
end_header
0 0 0
1 0 0
0 1 0
1 1 0
2 0 0
6 0 1 2 3 -1 4
"""
    p = tmp_path / "strip.ply"
    p.write_bytes(ply)
    m = load_mesh(str(p))
    # strip 0-1-2-3: triangles (0,1,2) and (2,1,3) [winding flipped];
    # the -1 restarts so the trailing '4' makes no triangle
    assert m.faces.shape == (2, 3)
    np.testing.assert_array_equal(np.sort(m.faces[0]), [0, 1, 2])
    np.testing.assert_array_equal(np.sort(m.faces[1]), [1, 2, 3])
    assert (m.faces >= 0).all()


def test_dae_instance_node(tmp_path):
    """<instance_node> into <library_nodes> places the geometry once per
    reference with the composed transform."""
    dae = """<?xml version="1.0"?>
<COLLADA xmlns="http://www.collada.org/2005/11/COLLADASchema" version="1.4.1">
 <asset><unit meter="1"/><up_axis>Z_UP</up_axis></asset>
 <library_geometries>
  <geometry id="tri"><mesh>
   <source id="pos"><float_array id="arr" count="9">0 0 0 1 0 0 0 1 0</float_array>
    <technique_common><accessor source="#arr" count="3" stride="3">
     <param name="X" type="float"/><param name="Y" type="float"/><param name="Z" type="float"/>
    </accessor></technique_common></source>
   <vertices id="vts"><input semantic="POSITION" source="#pos"/></vertices>
   <triangles count="1"><input semantic="VERTEX" source="#vts" offset="0"/>
    <p>0 1 2</p></triangles>
  </mesh></geometry>
 </library_geometries>
 <library_nodes>
  <node id="part"><instance_geometry url="#tri"/></node>
 </library_nodes>
 <library_visual_scenes>
  <visual_scene id="scene">
   <node><translate>10 0 0</translate><instance_node url="#part"/></node>
   <node><translate>0 20 0</translate><instance_node url="#part"/></node>
  </visual_scene>
 </library_visual_scenes>
 <scene><instance_visual_scene url="#scene"/></scene>
</COLLADA>
"""
    p = tmp_path / "inst.dae"
    p.write_text(dae)
    m = load_mesh(str(p))
    assert m.faces.shape == (2, 3)  # two placements
    xs = np.sort(np.unique(np.round(m.vertices[:, 0])))
    ys = np.sort(np.unique(np.round(m.vertices[:, 1])))
    assert 10.0 in xs and 20.0 in ys  # both transforms applied


# ---------------------------------------------------------------------------
# glTF 2.0 (.gltf / .glb)
# ---------------------------------------------------------------------------


def _gltf_doc(pos, idx, extra_node=None, interleave=False):
    """Minimal glTF JSON with one indexed TRIANGLES primitive."""
    import base64

    pos = np.asarray(pos, np.float32)
    idx = np.asarray(idx, np.uint16)
    if interleave:
        # POSITION interleaved with a dummy float pad (stride 16)
        inter = np.zeros((len(pos), 4), np.float32)
        inter[:, :3] = pos
        pbytes = inter.tobytes()
        stride = {"byteStride": 16}
    else:
        pbytes = pos.tobytes()
        stride = {}
    ibytes = idx.tobytes()
    if len(ibytes) % 4:
        ibytes += b"\0\0"
    buf = pbytes + ibytes
    doc = {
        "asset": {"version": "2.0"},
        "buffers": [{
            "byteLength": len(buf),
            "uri": "data:application/octet-stream;base64,"
                   + base64.b64encode(buf).decode(),
        }],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": len(pbytes), **stride},
            {"buffer": 0, "byteOffset": len(pbytes), "byteLength": len(idx.tobytes())},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": len(pos),
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5123, "count": idx.size,
             "type": "SCALAR"},
        ],
        "meshes": [{"primitives": [
            {"attributes": {"POSITION": 0}, "indices": 1, "mode": 4}
        ]}],
        "nodes": [extra_node or {"mesh": 0}],
        "scenes": [{"nodes": [0]}],
        "scene": 0,
    }
    return doc


def test_gltf_json_data_uri(tmp_path):
    import json

    # one triangle in glTF's Y-up frame; expect Z-up after load
    pos = [[0, 0, 0], [1, 0, 0], [0, 1, 0]]  # y_up
    doc = _gltf_doc(pos, [0, 1, 2])
    p = tmp_path / "tri.gltf"
    p.write_text(json.dumps(doc))
    m = load_mesh(str(p))
    assert m.n_faces == 1
    # (x, y, z)_yup -> (x, -z, y)_zup
    np.testing.assert_allclose(
        sorted(m.vertices.tolist()),
        sorted([[0, 0, 0], [1, 0, 0], [0, 0, 1]]),
        atol=1e-6,
    )


def test_gltf_node_trs_and_children(tmp_path):
    import json

    pos = [[0, 0, 0], [1, 0, 0], [0, 1, 0]]
    doc = _gltf_doc(pos, [0, 1, 2])
    # root translates by (0, 0, 5) (y_up), child carries the mesh with a
    # 90-deg rotation about +Y: quat (0, s, 0, c)
    s = np.sin(np.pi / 4)
    doc["nodes"] = [
        {"translation": [0, 0, 5], "children": [1]},
        {"mesh": 0, "rotation": [0.0, float(s), 0.0, float(np.cos(np.pi / 4))]},
    ]
    p = tmp_path / "trs.gltf"
    p.write_text(json.dumps(doc))
    m = load_mesh(str(p))
    assert m.n_faces == 1
    # y_up world: v1 (1,0,0) rotates to (0,0,-1), +(0,0,5) -> (0,0,4);
    # z_up: (x,-z,y) -> (0,-4,0)
    got = sorted(m.vertices.round(5).tolist())
    exp = sorted(np.asarray(
        [[0, -5, 0], [0, -4, 0], [0, -5, 1]], np.float32).tolist())
    np.testing.assert_allclose(got, exp, atol=1e-5)


def test_gltf_interleaved_stride(tmp_path):
    import json

    pos = [[0, 0, 0], [2, 0, 0], [0, 3, 0]]
    doc = _gltf_doc(pos, [0, 1, 2], interleave=True)
    p = tmp_path / "inter.gltf"
    p.write_text(json.dumps(doc))
    m = load_mesh(str(p))
    assert m.n_faces == 1
    np.testing.assert_allclose(
        sorted(m.vertices.tolist()),
        sorted([[0, 0, 0], [2, 0, 0], [0, 0, 3]]),
        atol=1e-6,
    )


def test_glb_container(tmp_path):
    import json
    import struct as st

    pos = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    idx = np.asarray([0, 1, 2], np.uint16)
    pbytes = pos.tobytes()
    ibytes = idx.tobytes() + b"\0\0"
    binc = pbytes + ibytes
    doc = {
        "asset": {"version": "2.0"},
        "buffers": [{"byteLength": len(binc)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": len(pbytes)},
            {"buffer": 0, "byteOffset": len(pbytes), "byteLength": 6},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5123, "count": 3, "type": "SCALAR"},
        ],
        "meshes": [{"primitives": [{"attributes": {"POSITION": 0}, "indices": 1}]}],
        "nodes": [{"mesh": 0}],
        "scenes": [{"nodes": [0]}],
        "scene": 0,
    }
    jb = json.dumps(doc).encode()
    jb += b" " * ((-len(jb)) % 4)
    glb = st.pack("<III", 0x46546C67, 2, 12 + 8 + len(jb) + 8 + len(binc))
    glb += st.pack("<II", len(jb), 0x4E4F534A) + jb
    glb += st.pack("<II", len(binc), 0x004E4942) + binc
    p = tmp_path / "tri.glb"
    p.write_bytes(glb)
    m = load_mesh(str(p))
    assert m.n_faces == 1
    np.testing.assert_allclose(
        sorted(m.vertices.tolist()),
        sorted([[0, 0, 0], [1, 0, 0], [0, 0, 1]]),
        atol=1e-6,
    )


def test_3mf_build_transform(tmp_path):
    import zipfile

    # unit right triangle, instanced twice via build items: identity and +10 x
    model = """<?xml version="1.0"?>
<model unit="meter" xmlns="http://schemas.microsoft.com/3dmanufacturing/core/2015/02">
 <resources>
  <object id="1" type="model">
   <mesh>
    <vertices>
     <vertex x="0" y="0" z="0"/><vertex x="1" y="0" z="0"/><vertex x="0" y="1" z="0"/>
    </vertices>
    <triangles><triangle v1="0" v2="1" v3="2"/></triangles>
   </mesh>
  </object>
 </resources>
 <build>
  <item objectid="1"/>
  <item objectid="1" transform="1 0 0 0 1 0 0 0 1 10 0 0"/>
 </build>
</model>"""
    p = tmp_path / "tri.3mf"
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("3D/3dmodel.model", model)
    m = load_mesh(str(p))
    assert m.n_faces == 2
    xs = np.sort(m.vertices[:, 0])
    np.testing.assert_allclose(xs, [0, 0, 1, 10, 10, 11], atol=1e-6)


def test_3mf_components(tmp_path):
    import zipfile

    model = """<?xml version="1.0"?>
<model unit="meter" xmlns="http://schemas.microsoft.com/3dmanufacturing/core/2015/02">
 <resources>
  <object id="1" type="model">
   <mesh>
    <vertices>
     <vertex x="0" y="0" z="0"/><vertex x="1" y="0" z="0"/><vertex x="0" y="0" z="1"/>
    </vertices>
    <triangles><triangle v1="0" v2="1" v3="2"/></triangles>
   </mesh>
  </object>
  <object id="2" type="model">
   <components>
    <component objectid="1" transform="1 0 0 0 1 0 0 0 1 0 5 0"/>
   </components>
  </object>
 </resources>
 <build><item objectid="2"/></build>
</model>"""
    p = tmp_path / "comp.3mf"
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("3D/3dmodel.model", model)
    m = load_mesh(str(p))
    assert m.n_faces == 1
    np.testing.assert_allclose(m.vertices[:, 1], [5, 5, 5], atol=1e-6)


def test_3mf_unit_scaling(tmp_path):
    import zipfile

    # 3MF core spec: model/@unit defaults to MILLIMETER — a spec-default
    # file must land 1000x smaller in the metre-based map frame (same
    # policy as the DAE loader's <unit meter=.../> handling)
    model = """<?xml version="1.0"?>
<model xmlns="http://schemas.microsoft.com/3dmanufacturing/core/2015/02">
 <resources>
  <object id="1" type="model">
   <mesh>
    <vertices>
     <vertex x="0" y="0" z="0"/><vertex x="1000" y="0" z="0"/><vertex x="0" y="1000" z="0"/>
    </vertices>
    <triangles><triangle v1="0" v2="1" v3="2"/></triangles>
   </mesh>
  </object>
 </resources>
 <build><item objectid="1"/></build>
</model>"""
    p = tmp_path / "mm.3mf"
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("3D/3dmodel.model", model)
    m = load_mesh(str(p))
    np.testing.assert_allclose(np.max(m.vertices), 1.0, atol=1e-6)
    # explicit inch unit
    p2 = tmp_path / "inch.3mf"
    with zipfile.ZipFile(p2, "w") as z:
        z.writestr("3D/3dmodel.model", model.replace("<model ", '<model unit="inch" '))
    m2 = load_mesh(str(p2))
    np.testing.assert_allclose(np.max(m2.vertices), 25.4, atol=1e-4)


def test_3mf_rels_root_and_no_duplicate_fallback(tmp_path):
    import zipfile

    # two .model parts: a decoy listed first in the namelist and the real
    # root named by _rels/.rels; plus an unbuilt assembly (id=3) that
    # references the built object (id=1) as a component — the fallback
    # must NOT re-emit object 1
    model = """<?xml version="1.0"?>
<model unit="meter" xmlns="http://schemas.microsoft.com/3dmanufacturing/core/2015/02">
 <resources>
  <object id="1" type="model">
   <mesh>
    <vertices>
     <vertex x="0" y="0" z="0"/><vertex x="1" y="0" z="0"/><vertex x="0" y="1" z="0"/>
    </vertices>
    <triangles><triangle v1="0" v2="1" v3="2"/></triangles>
   </mesh>
  </object>
  <object id="3">
   <components><component objectid="1"/></components>
  </object>
 </resources>
 <build><item objectid="1"/></build>
</model>"""
    decoy = model.replace('x="1"', 'x="99"')
    rels = """<?xml version="1.0"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
 <Relationship Id="rel0" Target="/3D/real.model"
  Type="http://schemas.microsoft.com/3dmanufacturing/2013/01/3dmodel"/>
</Relationships>"""
    p = tmp_path / "rels.3mf"
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("3D/a_decoy.model", decoy)
        z.writestr("3D/real.model", model)
        z.writestr("_rels/.rels", rels)
    m = load_mesh(str(p))
    assert m.n_faces == 1  # root via rels, no duplicate from the fallback
    assert np.max(m.vertices) == 1.0


def test_x3d_indexed_face_set(tmp_path):
    # quad in the X3D ground plane (y=0), fan-triangulated; Y-up -> Z-up
    x3d = """<?xml version="1.0"?>
<X3D><Scene>
 <Transform translation="0 2 0">
  <Shape>
   <IndexedFaceSet coordIndex="0 1 2 3 -1">
    <Coordinate DEF="C" point="0 0 0, 1 0 0, 1 0 -1, 0 0 -1"/>
   </IndexedFaceSet>
  </Shape>
 </Transform>
 <Shape>
  <IndexedTriangleSet index="0 1 2">
   <Coordinate USE="C"/>
  </IndexedTriangleSet>
 </Shape>
</Scene></X3D>"""
    p = tmp_path / "quad.x3d"
    p.write_text(x3d)
    m = load_mesh(str(p))
    assert m.n_faces == 3  # quad fan (2) + reused-coord triangle (1)
    # translated quad: X3D y=2 becomes ROS z=2; untranslated triangle z=0
    zs = np.round(np.sort(m.vertices[:, 2]), 5)
    assert (zs == 2.0).sum() == 4 and (zs == 0.0).sum() == 4
    # X3D -z forward becomes ROS +y
    assert m.vertices[:, 1].max() == 1.0 and m.vertices[:, 1].min() == 0.0


def test_x3d_rotation(tmp_path):
    # 90 deg about X3D y-axis with center offset
    x3d = """<?xml version="1.0"?>
<X3D><Scene>
 <Transform rotation="0 1 0 1.5707963" center="1 0 0">
  <Shape>
   <IndexedTriangleSet index="0 1 2">
    <Coordinate point="1 0 0 2 0 0 1 1 0"/>
   </IndexedTriangleSet>
  </Shape>
 </Transform>
</Scene></X3D>"""
    p = tmp_path / "rot.x3d"
    p.write_text(x3d)
    m = load_mesh(str(p))
    # (2,0,0) rotates about center (1,0,0) to X3D (1,0,-1) -> ROS (1,1,0)
    got = sorted(np.round(m.vertices, 5).tolist())
    assert [1.0, 0.0, 0.0] in got and [1.0, 1.0, 0.0] in got and [1.0, 0.0, 1.0] in got


def test_3ds_two_objects(tmp_path):
    def chunk(cid, body):
        return struct.pack("<HI", cid, 6 + len(body)) + body

    def trimesh_obj(name, verts, faces):
        pts = struct.pack("<H", len(verts)) + np.asarray(verts, np.float32).tobytes()
        fcs = struct.pack("<H", len(faces)) + np.asarray(
            [[a, b, c, 0] for a, b, c in faces], np.uint16
        ).tobytes()
        tm = chunk(0x4100, chunk(0x4110, pts) + chunk(0x4120, fcs))
        return chunk(0x4000, name.encode() + b"\x00" + tm)

    o1 = trimesh_obj("a", [[0, 0, 0], [1, 0, 0], [0, 1, 0]], [[0, 1, 2]])
    o2 = trimesh_obj("b", [[0, 0, 5], [1, 0, 5], [0, 1, 5]], [[0, 1, 2]])
    data = chunk(0x4D4D, chunk(0x3D3D, o1 + o2))
    p = tmp_path / "two.3ds"
    p.write_bytes(data)
    m = load_mesh(str(p))
    assert m.n_faces == 2 and m.n_vertices == 6
    assert set(np.round(m.vertices[:, 2], 5)) == {0.0, 5.0}
