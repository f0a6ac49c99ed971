"""Model 10M-face engine configs on CPU (hardware-independent counts).

Pair work per correction = sorted-chunk trips x CHUNK x B x Rb. The 10M
row is pair-bound (roofline), so the config that minimizes pairs while
staying lossless (hit-rate audited vs the shipped config) is the one to
chip-time. Builds the mesh once, then sweeps (bin_size, c_bin, tile).

Usage: env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python scripts/sweep_10m_model.py
"""
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path[:] = [p for p in sys.path if "/root/.axon_site" not in p]

import numpy as np
import jax.numpy as jnp

from rmcl_tpu.bvh.bins import build_bins
from rmcl_tpu.geom.mesh import make_sphere
from rmcl_tpu.ops.raycast_binned import (
    TiledSweep, cast_rays_binned_factored, factored_candidates,
)
from rmcl_tpu.sensors.models import SphericalModel

faces = int(os.environ.get("SW_FACES", 10_000_000))
n_poses = int(os.environ.get("SW_POSES", 100))
CHUNK = 512

n = int(np.sqrt(faces / 2))
mesh = make_sphere(n, n, radius=50.0)
model = SphericalModel.vlp16(width=900)
_, dirs_s = model.rays()
rng = np.random.default_rng(0)
trans = rng.uniform(-5, 5, size=(n_poses, 3)).astype(np.float32)
n_rays = n_poses * model.n_rays
print(f"{mesh.faces.shape[0]} faces, {n_poses} poses", flush=True)

# reference hits for the lossless audit: shipped 10M config
CONFIGS = [
    # (B, cb, cs, ch, pt, az) — first row is the shipped baseline.
    # Key model: for surface meshes #bins-crossed ~ footprint_area /
    # cell_area and cell_area ~ B, so pair work ~ footprint_area,
    # INVARIANT under B alone — but small tiles only realize their
    # footprint shrink when bins are fine enough not to quantize it away
    # (round-2 tested tiles and bins separately; candidate reuse now
    # amortizes the cull cost that killed small tiles at 10M).
    (512, 128, 32, 24, 16, 8),
    (512, 96, 32, 24, 8, 4),
    (256, 160, 40, 24, 8, 4),
    (128, 256, 48, 24, 8, 4),
    (128, 320, 48, 24, 8, 2),
    (256, 128, 48, 24, 4, 4),
    # combined fine-bin + small-tile rows (the footprint-shrink bet)
    (64, 512, 64, 24, 8, 4),
    (64, 640, 80, 24, 8, 4),
    (64, 512, 64, 24, 16, 8),
    (128, 384, 48, 24, 8, 4),
    (64, 384, 64, 24, 4, 4),
]
if faces <= 2_000_000:
    # headline-scale rows: same footprint-shrink bet at the 1M config
    # (B=64 is already the 1M bin size; the baseline row is the shipped
    # 16x8/cb=64 headline config)
    CONFIGS = [
        (64, 64, 24, 20, 16, 8),
        (64, 64, 24, 20, 8, 8),
        (64, 96, 32, 20, 8, 4),
        (64, 96, 32, 20, 4, 4),
        (64, 128, 48, 20, 4, 2),
        (32, 128, 48, 20, 8, 4),
        (128, 64, 24, 20, 8, 4),
    ]

ref_t = None
for (B, cb, cs, ch, pt, az) in CONFIGS:
    try:
        bins = build_bins(mesh, bin_size=B, bins_per_super=16,
                          supers_per_hyper=16)
        sweep = TiledSweep(trans, model.width, model.height,
                           poses_per_tile=pt, az_tile=az, el_tile=1)
        o_blk, d_blk = sweep.factored_rays(
            jnp.asarray(trans), jnp.asarray(dirs_s))
        cands = factored_candidates(
            bins, o_blk, d_blk, c_bin=cb, block_chunk=CHUNK, c_hyper=ch,
            c_super=cs, sub_blocks=4, origin_margin=0.03)
        counts = np.asarray(cands[1])
        n_blk = counts.shape[0]
        Rb = pt * az
        cs_sorted = np.sort(counts)
        n_chunks = n_blk // CHUNK
        trips = cs_sorted.reshape(n_chunks, CHUNK).max(axis=1)
        pairs = float(trips.sum()) * CHUNK * B * Rb
        # lossless audit: hits vs the baseline (first config)
        hits = cast_rays_binned_factored(
            bins, o_blk, d_blk, candidates=cands, c_bin=cb, c_hyper=ch,
            c_super=cs, sub_blocks=4, block_chunk=CHUNK, sort_blocks=True)
        # canonical (pose, dir) order: tile shapes permute rays differently
        t = np.asarray(
            sweep.unpermute(hits.t.reshape(sweep.n_rays, 1))
        ).ravel()
        hr = float(np.asarray(hits.hit).mean())
        if ref_t is None:
            ref_t = t
            agree = 1.0
        else:
            agree = float(np.mean(np.isclose(t, ref_t, rtol=1e-5, atol=1e-4)))
        sat = float((counts >= cb).mean())
        print(f"B={B:4d} cb={cb:4d} cs={cs} ch={ch} tile={pt:2d}x{az}: "
              f"pairs {pairs/1e9:7.2f} G ({pairs/n_rays:8.0f}/ray)  "
              f"counts mean {counts.mean():6.1f} max {counts.max():4d} "
              f"sat {sat:.3f}  hit {hr:.6f}  t-agree {agree:.6f}",
              flush=True)
    except Exception as e:
        print(f"B={B} cb={cb} tile={pt}x{az}: FAILED {type(e).__name__} {e}",
              flush=True)
