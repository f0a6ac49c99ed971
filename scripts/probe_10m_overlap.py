"""Rows-per-ray-served headroom at 10M faces (VERDICT r4 #3).

The 10M correction is gather-OP bound (probe_vstream): each gathered
candidate row serves one 128-ray block. The proposed lever is serving
MULTIPLE adjacent blocks per gathered row (merge blocks sharing candidate
sets / bin-major scheduling over block groups). Its ceiling is set by the
candidate-set OVERLAP between adjacent blocks, measured here on CPU
(counts are hardware-independent) at the shipped 10M bench config.

For group sizes G in {2, 4}: gather-op factor = |union of G adjacent
blocks' candidates| / (G x mean count) (fraction of row gathers kept) and
pair-work inflation = same union vs the per-block sum (each gathered row
now meets G*Rb lanes). Model the wall effect with the r4 phase shares
(stream ~60%, pair ~25% of the 10M correction).

Usage: PYTHONPATH=/root/repo python scripts/probe_10m_overlap.py
"""

import json
import os
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from rmcl_tpu.bvh.bins import build_bins
from rmcl_tpu.geom.mesh import make_sphere
from rmcl_tpu.ops.raycast_binned import TiledSweep, factored_candidates
from rmcl_tpu.sensors.models import SphericalModel

FACES = int(os.environ.get("OV_FACES", 10_000_000))
POSES = int(os.environ.get("OV_POSES", 100))  # subsample of the 1000
CB = int(os.environ.get("OV_CB", 512))
CS = int(os.environ.get("OV_CS", 128))
SUB = int(os.environ.get("OV_SUB", 128))


def main():
    n = int(np.sqrt(FACES / 2))
    mesh = make_sphere(n, n, radius=50.0)
    bins = build_bins(mesh, bin_size=64, bins_per_super=16,
                      supers_per_hyper=16)
    model = SphericalModel.vlp16(width=900)
    rng = np.random.default_rng(0)
    trans = jnp.asarray(rng.uniform(-5, 5, (POSES, 3)), jnp.float32)
    _, dirs_s = model.rays()
    # the bench's block structure: Morton-clustered poses x 16x8
    # direction-major tiles (the factored engine's (pose x dir) blocks)
    sweep = TiledSweep(np.asarray(trans), model.width, model.height,
                       poses_per_tile=16, az_tile=8, el_tile=1)
    o_blk, d_blk = sweep.factored_rays(trans, jnp.asarray(dirs_s))
    n_blk = o_blk.shape[0]
    print(f"blocks {n_blk}", file=sys.stderr)
    cand, count, _ = factored_candidates(
        bins, o_blk, d_blk, t_max=130.0, c_super=CS, c_bin=CB,
        sub_blocks=SUB, block_chunk=512,
    )
    cand = np.asarray(cand)[:n_blk]
    count = np.asarray(count)[:n_blk]
    sets = [set(row[row >= 0].tolist()) for row in cand]
    mean_count = float(np.mean([len(s) for s in sets]))

    out = {"faces": int(mesh.faces.shape[0]), "n_blocks": int(n_blk),
           "mean_count": round(mean_count, 1),
           "max_count": int(count.max()), "groups": {}}
    # adjacent in BLOCK ORDER (tiled sweep order = the stream order)
    for G in (2, 4, 8):
        unions = []
        for i in range(0, len(sets) - G + 1, G):
            u = set()
            for j in range(G):
                u |= sets[i + j]
            unions.append(len(u))
        union_mean = float(np.mean(unions))
        gather_factor = union_mean / (G * mean_count)  # rows kept
        pair_inflation = union_mean * G / (G * mean_count)  # vs sum
        # wall model with the r4 10M phase shares
        wall = 0.60 * gather_factor + 0.25 * pair_inflation + 0.15
        out["groups"][f"G{G}"] = {
            "union_mean": round(union_mean, 1),
            "gather_op_factor": round(gather_factor, 3),
            "pair_inflation": round(pair_inflation, 3),
            "modeled_wall_factor": round(wall, 3),
        }
        print(out["groups"][f"G{G}"], file=sys.stderr)
    print("OVERLAP_JSON:" + json.dumps(out))


if __name__ == "__main__":
    main()
