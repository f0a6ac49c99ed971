"""MICP-L pose-update rate on chip — the BASELINE.json product metric.

Workload: single-robot 6-DoF tracking through the procedural building map
(BASELINE config-2 class: multi-room mesh, ~480k faces at subdiv 45) with
a VLP-16 scan (900x16 = 14,400 rays) per correction, drifting odometry,
full correct-once semantics (cast + 5 GN iterations + annealing) via
micp.tracking.TrackedCorrector (candidate reuse with re-cull-on-drift).

The reference caps its correction thread at 1000 Hz
(micp_localization.cpp:130) and reports avg correction runtime per 1000
iters (:1120-1161); its benchmark-class desktop CPU does 14.4k rays in
~2-3 ms (71.6 M rays/s at 1M faces) => ~300-500 Hz sustained. This bench
reports corrections/second with the SAME semantics: T chained corrections
per dispatch (lax.scan; this backend has ~58 ms RPC per dispatch),
fresh trajectory data per timing (relay result-cache hazard), readback-
closed timing regions (TPU_NOTES).

Two regimes:
  * high_rate: 2 mm / 0.1 deg per step (a 1 m/s robot corrected at
    ~500 Hz) — reuse serves nearly every step.
  * rate_20hz: 5 cm / 1 deg per step (the same robot at 20 Hz) — the
    margin forces frequent re-culls.

Writes MICP_HZ_r05.json. Usage (TPU): python scripts/bench_micp_hz.py
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp

from rmcl_tpu.bvh.bins import build_bins
from rmcl_tpu.geom.mesh import make_building_scene
from rmcl_tpu.math.se3 import Quaternion, Transform
from rmcl_tpu.micp.pipeline import MICPConfig, MICPSensorConfig, MICPSensorData
from rmcl_tpu.micp.tracking import TrackedCorrector
from rmcl_tpu.sensors.models import SphericalModel
from rmcl_tpu.sensors.simulate import simulate
from rmcl_tpu.utils.timing import sync

SUBDIV = int(os.environ.get("HZ_SUBDIV", 45))
T = int(os.environ.get("HZ_STEPS", 32))  # corrections per dispatch
ITERS = int(os.environ.get("HZ_ITERS", 3))
C_BIN = int(os.environ.get("HZ_CBIN", 96))
C_SUP = int(os.environ.get("HZ_CSUP", 24))
C_HYP = int(os.environ.get("HZ_CHYP", 0))
SUBB = int(os.environ.get("HZ_SUBB", 4))  # sub-block cone ladder
CHUNK = int(os.environ.get("HZ_CHUNK", 64))  # single-scan casts have ~113 blocks
PAYLOAD = os.environ.get("HZ_PAYLOAD", "plane")
FLOOR = float(os.environ.get("HZ_FLOOR", 0.005))  # s per dispatch


def build_world():
    mesh = make_building_scene(rooms_x=4, rooms_y=3, subdiv=SUBDIV, seed=0,
                               door_t=0.5)
    bins = build_bins(mesh, bin_size=64, bins_per_super=16,
                      supers_per_hyper=16)
    model = SphericalModel.vlp16(width=900)
    return mesh, bins, model


def trajectory(rng, n, step_t, step_r, start):
    """Smooth wander inside one room: per-step translation ~step_t,
    yaw ~step_r (radians)."""
    pos = np.zeros((n, 3), np.float32)
    yaw = np.zeros(n, np.float32)
    p = np.asarray(start, np.float32).copy()
    h = rng.uniform(0, 2 * np.pi)
    for i in range(n):
        h += rng.normal(0.0, step_r)
        p[:2] += step_t * np.asarray([np.cos(h), np.sin(h)], np.float32)
        p[:2] = np.clip(p[:2], 1.5, 16.5)  # stay inside the building
        pos[i] = p
        yaw[i] = h * 0.2  # heading swings the sensor too
    return pos, yaw


def main():
    mesh, bins, model = build_world()
    print(f"map: {mesh.faces.shape[0]} faces, {bins.n_bins} bins",
          file=sys.stderr)
    cfg = MICPConfig(c_bin=C_BIN, c_super=C_SUP, c_hyper=C_HYP)
    scfg = MICPSensorConfig.create(max_dist=1.0)
    tsb = Transform.identity()
    tc = TrackedCorrector(bins, model, cfg, origin_margin=0.05,
                          dir_margin=0.01, sub_blocks=SUBB,
                          block_chunk=CHUNK, payload=PAYLOAD)

    # budget sanity at a representative pose (saturation = silent loss)
    st0 = tc.init(bins, Transform(rot=jnp.asarray([1.0, 0, 0, 0]),
                                  trans=jnp.asarray([3.0, 3.0, 1.2])),
                  Transform.identity(), tsb)
    cmax = int(jnp.max(st0.candidates[0][1]))
    print(f"candidates/block max {cmax} (budget {C_BIN})", file=sys.stderr)

    def scan_window(state, pts, msk, tbo_q, tbo_t):
        def body(st, inp):
            p, m, q, t = inp
            sensor = MICPSensorData(model=model, points=p, mask=m, tsb=tsb,
                                    config=scfg)
            st, stats = tc._step_impl(bins, (sensor,), st,
                                      Transform(rot=q, trans=t))
            return st, st.tom.trans
        return jax.lax.scan(body, state, (pts, msk, tbo_q, tbo_t))

    scan_window_j = jax.jit(scan_window)

    results = {"metric": "micp_tracking_corrections_per_sec",
               "map_faces": int(mesh.faces.shape[0]),
               "rays_per_correction": model.n_rays,
               "gn_iterations": cfg.optimization_iterations,
               "sub_blocks": SUBB, "block_chunk": CHUNK,
               "payload": PAYLOAD, "c_super": C_SUP,
               "reference": "correction cap 1000 Hz (micp_localization.cpp:130)",
               "rows": []}

    # T-sweep: the relay charges ~58 ms RPC per dispatch; measuring the
    # same regime at T and 4T separates device time from the RPC artifact
    # (VERDICT r4 #5: report the dispatch-free device rate alongside)
    for regime, step_t, step_r, T_row in (
        ("high_rate", 0.002, 0.002, T),
        ("high_rate", 0.002, 0.002, 4 * T),
        ("rate_20hz", 0.05, 0.02, T),
    ):
        rng = np.random.default_rng(1)
        times = []
        row_err = row_reculls = 0.0
        for it in range(ITERS + 1):  # +1 warm
            pos, yaw = trajectory(rng, T_row, step_t, step_r,
                                  start=[3.0 + 0.1 * it, 3.0, 1.2])
            truths = Transform.from_xyz_euler(
                jnp.asarray(pos), jnp.stack(
                    [jnp.zeros(T_row), jnp.zeros(T_row),
                     jnp.asarray(yaw)], -1))
            # scans at truth (dataset build — not timed, like the bench)
            hits = simulate(bins, model, truths, c_super=24, c_bin=C_BIN)
            ranges = jnp.where(hits.hit, hits.t, 0.0)
            pts = jax.vmap(model.polar_to_cartesian)(ranges)
            msk = hits.hit
            # drifting odometry: tbo = drift^-1 * truth (so tbm = tom@tbo
            # must re-discover truth; drift grows per step)
            dr = np.cumsum(
                rng.normal(0, 0.002, (T_row, 3)).astype(np.float32),
                0) * np.asarray([1, 1, 0], np.float32)
            tbo = Transform(
                rot=truths.rot,
                trans=truths.trans + jnp.asarray(dr),
            )
            state = tc.init(bins, Transform.identity(), tbo[0], tsb)
            sync((pts, msk, state))
            t0 = time.time()
            state, track = scan_window_j(state, pts, msk, tbo.rot, tbo.trans)
            sync(state.tom.trans)
            dt = time.time() - t0
            # track quality: corrected pose vs truth
            err = np.linalg.norm(
                np.asarray(state.tom.trans) + np.asarray(tbo.trans[-1])
                - np.asarray(truths.trans[-1]))
            if it == 0:
                print(f"{regime} T={T_row}: warm {dt:.3f}s", file=sys.stderr)
                continue
            times.append(dt)
            row_err = float(err)
            row_reculls = int(state.n_reculls)
            print(f"{regime} T={T_row} it{it}: {dt:.4f}s for {T_row} "
                  f"corrections, reculls {int(state.n_reculls)}, "
                  f"end err {err:.4f} m",
                  file=sys.stderr)
        real = [t for t in times if t > FLOOR]
        best = min(real) if real else min(times)
        results["rows"].append({
            "regime": regime,
            "steps_per_dispatch": T_row,
            "step_translation_m": step_t,
            "corrections_per_sec": round(T_row / best, 1),
            "ms_per_correction": round(1000 * best / T_row, 3),
            "seconds_per_dispatch": round(best, 4),
            "reculls_per_window": row_reculls,
            "end_pose_error_m": round(row_err, 5),
        })

    # dispatch-free device rate from the two high_rate windows:
    # t(T) = fixed + T*device_ms  =>  device_ms = (t4 - t1) / 3T
    r1, r4 = results["rows"][0], results["rows"][1]
    dev_ms = 1000.0 * (
        r4["seconds_per_dispatch"] - r1["seconds_per_dispatch"]
    ) / (r4["steps_per_dispatch"] - r1["steps_per_dispatch"])
    results["device_ms_per_correction"] = round(dev_ms, 3)
    results["device_corrections_per_sec"] = round(1000.0 / dev_ms, 1)
    results["dispatch_fixed_ms"] = round(
        1000.0 * r1["seconds_per_dispatch"]
        - dev_ms * r1["steps_per_dispatch"], 1)
    print(f"device rate: {results['device_corrections_per_sec']}/s "
          f"({dev_ms:.3f} ms/corr; fixed {results['dispatch_fixed_ms']} ms)",
          file=sys.stderr)

    # --- two-sensor rig: spherical + O1Dn (VERDICT r3 #6 done-criterion:
    # multi-sensor tracked rate within 1.5x of single-sensor) -------------
    from rmcl_tpu.sensors.models import O1DnModel

    rng = np.random.default_rng(7)
    d2 = rng.normal(size=(2048, 3)).astype(np.float32)
    d2[:, 2] = np.abs(d2[:, 2]) * -0.3  # mostly forward/level fan
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    o1dn = O1DnModel.create(jnp.asarray(d2), range_max=50.0)
    tsb2 = Transform.from_pose_tuple(
        jnp.asarray([0.1, 0.0, 0.15, 0.0, 0.0, 0.0]))
    tc2 = TrackedCorrector(bins, [model, o1dn], cfg, origin_margin=0.05,
                           dir_margin=0.01, sub_blocks=SUBB,
                           block_chunk=CHUNK, payload=PAYLOAD)

    def scan_window2(state, pts, msk, pts2, msk2, tbo_q, tbo_t):
        def body(st, inp):
            p, m, p2, m2, q, t = inp
            s1 = MICPSensorData(model=model, points=p, mask=m, tsb=tsb,
                                config=scfg)
            s2 = MICPSensorData(model=o1dn, points=p2, mask=m2, tsb=tsb2,
                                config=MICPSensorConfig.create(
                                    max_dist=1.0, weight=0.7))
            st, stats = tc2._step_impl(bins, (s1, s2), st,
                                       Transform(rot=q, trans=t))
            return st, st.tom.trans
        return jax.lax.scan(body, state, (pts, msk, pts2, msk2, tbo_q, tbo_t))

    scan_window2_j = jax.jit(scan_window2)
    rng = np.random.default_rng(1)
    times = []
    row_err = row_reculls = 0.0
    for it in range(ITERS + 1):
        pos, yaw = trajectory(rng, T, 0.002, 0.002,
                              start=[3.0 + 0.1 * it, 3.0, 1.2])
        truths = Transform.from_xyz_euler(
            jnp.asarray(pos),
            jnp.stack([jnp.zeros(T), jnp.zeros(T), jnp.asarray(yaw)], -1))
        hits = simulate(bins, model, truths, c_super=24, c_bin=C_BIN)
        pts = jax.vmap(model.polar_to_cartesian)(
            jnp.where(hits.hit, hits.t, 0.0))
        msk = hits.hit
        hits2 = simulate(bins, o1dn, truths @ tsb2, c_super=24, c_bin=C_BIN)
        pts2 = jax.vmap(o1dn.polar_to_cartesian)(
            jnp.where(hits2.hit, hits2.t, 0.0))
        msk2 = hits2.hit
        dr = np.cumsum(rng.normal(0, 0.002, (T, 3)).astype(np.float32),
                       0) * np.asarray([1, 1, 0], np.float32)
        tbo = Transform(rot=truths.rot, trans=truths.trans + jnp.asarray(dr))
        state = tc2.init(bins, Transform.identity(), tbo[0], [tsb, tsb2])
        sync((pts, msk, pts2, msk2, state))
        t0 = time.time()
        state, track = scan_window2_j(state, pts, msk, pts2, msk2,
                                      tbo.rot, tbo.trans)
        sync(state.tom.trans)
        dt = time.time() - t0
        err = np.linalg.norm(
            np.asarray(state.tom.trans) + np.asarray(tbo.trans[-1])
            - np.asarray(truths.trans[-1]))
        if it == 0:
            print(f"two_sensor: warm {dt:.3f}s", file=sys.stderr)
            continue
        times.append(dt)
        row_err = float(err)
        row_reculls = int(state.n_reculls)
        print(f"two_sensor it{it}: {dt:.4f}s for {T} corrections, "
              f"reculls {row_reculls}, end err {err:.4f} m", file=sys.stderr)
    real = [t for t in times if t > FLOOR]
    best = min(real) if real else min(times)
    results["rows"].append({
        "regime": "two_sensor_sph_o1dn",
        "rays_per_correction": model.n_rays + o1dn.n_rays,
        "corrections_per_sec": round(T / best, 1),
        "ms_per_correction": round(1000 * best / T, 3),
        "reculls_per_window": row_reculls,
        "end_pose_error_m": round(row_err, 5),
    })

    out = os.environ.get("HZ_OUT", "/root/repo/MICP_HZ_r05.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
