"""Compile the bench cast and report the while-loop body's HBM buffers —
what actually materializes per trip (diagnosis tool, compile-only)."""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from rmcl_tpu.bvh.bins import build_bins
from rmcl_tpu.geom.mesh import make_sphere
from rmcl_tpu.ops.raycast_binned import TiledSweep, cast_rays_binned
from rmcl_tpu.sensors.models import SphericalModel

B = int(os.environ.get("HLO_B", 64))
CB = int(os.environ.get("HLO_CB", 48))
POSES = int(os.environ.get("HLO_POSES", 1000))


def main():
    n = int(np.sqrt(1_000_000 / 2))
    mesh = make_sphere(n, n, radius=50.0)
    bins = build_bins(mesh, bin_size=B)
    model = SphericalModel.vlp16(width=900)
    _, dirs_s = model.rays()
    rng = np.random.default_rng(0)
    trans = rng.uniform(-5, 5, size=(POSES, 3)).astype(np.float32)
    sweep = TiledSweep(trans, model.width, model.height, 16, 8, 1)

    @jax.jit
    def full(t, d):
        o, dd = sweep.rays(t, d)
        h = cast_rays_binned(bins, o, dd, block_size=sweep.block_size,
                             dir_groups=sweep.dir_groups, c_super=24,
                             c_bin=CB, sub_blocks=4, block_chunk=256)
        return h.t, h.normal, h.hit

    lowered = full.lower(jnp.asarray(trans), jnp.asarray(np.asarray(dirs_s)))
    compiled = lowered.compile()
    txt = compiled.as_text()
    print(f"HLO text: {len(txt)} chars", flush=True)

    # pull the while loop bodies and their largest-shaped ops
    sizes = {}
    for m in re.finditer(r"f32\[([\d,]+)\]", txt):
        dims = [int(x) for x in m.group(1).split(",")]
        n_el = int(np.prod(dims))
        if n_el >= 1 << 20:
            sizes[tuple(dims)] = sizes.get(tuple(dims), 0) + 1
    print("f32 shapes >= 1M elems (shape: count):")
    for k in sorted(sizes, key=lambda k: -int(np.prod(k))):
        print(f"  {k}: {sizes[k]}  ({np.prod(k)*4/1e6:.1f} MB)")

    # per-op memory stats if available
    try:
        mem = compiled.memory_analysis()
        print("memory analysis:", mem)
    except Exception as e:
        print("no memory analysis:", e)

    out = os.environ.get("HLO_OUT", "/tmp/cast_hlo.txt")
    with open(out, "w") as f:
        f.write(txt)
    print("full HLO written to", out)


if __name__ == "__main__":
    main()
