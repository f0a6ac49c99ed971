"""Checkpoint / resume for localization state.

The reference has NO checkpointing (SURVEY.md §5: "state is the particle
cloud / Tom; recovery = re-initialization services"). Here snapshots are a
first-class superset: the particle cloud, the tracked Tom, convergence
state and the RNG key serialize to a single NPZ (or, when available, an
orbax checkpoint directory for sharded multi-host state).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from rmcl_tpu.math.gaussian import Gaussian1D
from rmcl_tpu.math.se3 import Transform
from rmcl_tpu.mcl.particles import ParticleCloud


def save_mcl_state(path: str, cloud: ParticleCloud, key, extra: Optional[Dict[str, Any]] = None) -> None:
    """Snapshot a particle filter to NPZ (host-gathered)."""
    data = {
        "poses_rot": np.asarray(cloud.poses.rot),
        "poses_trans": np.asarray(cloud.poses.trans),
        "lik_mean": np.asarray(cloud.likelihood.mean),
        "lik_sigma": np.asarray(cloud.likelihood.sigma),
        "lik_n": np.asarray(cloud.likelihood.n_meas),
        "state_sigma": np.asarray(cloud.state_sigma),
        "alive": np.asarray(cloud.alive),
        "key": np.asarray(key),
    }
    for k, v in (extra or {}).items():
        data[f"extra_{k}"] = np.asarray(v)
    np.savez_compressed(path, **data)


def load_mcl_state(path: str):
    """Restore (cloud, key, extra) from an NPZ snapshot."""
    z = np.load(path)
    cloud = ParticleCloud(
        poses=Transform(rot=jnp.asarray(z["poses_rot"]), trans=jnp.asarray(z["poses_trans"])),
        likelihood=Gaussian1D(
            mean=jnp.asarray(z["lik_mean"]),
            sigma=jnp.asarray(z["lik_sigma"]),
            n_meas=jnp.asarray(z["lik_n"]),
        ),
        state_sigma=jnp.asarray(z["state_sigma"]),
        alive=jnp.asarray(z["alive"]),
    )
    key = jnp.asarray(z["key"])
    extra = {
        k[len("extra_"):]: z[k] for k in z.files if k.startswith("extra_")
    }
    return cloud, key, extra


def save_micp_state(path: str, tom: Transform, tbo: Transform, convergence, extra=None) -> None:
    data = {
        "tom_rot": np.asarray(tom.rot),
        "tom_trans": np.asarray(tom.trans),
        "tbo_rot": np.asarray(tbo.rot),
        "tbo_trans": np.asarray(tbo.trans),
        "convergence": np.asarray(convergence),
    }
    for k, v in (extra or {}).items():
        data[f"extra_{k}"] = np.asarray(v)
    np.savez_compressed(path, **data)


def load_micp_state(path: str):
    """Returns (tom, tbo, convergence, extra) — symmetric with
    save_micp_state's ``extra`` dict (like load_mcl_state)."""
    z = np.load(path)
    tom = Transform(rot=jnp.asarray(z["tom_rot"]), trans=jnp.asarray(z["tom_trans"]))
    tbo = Transform(rot=jnp.asarray(z["tbo_rot"]), trans=jnp.asarray(z["tbo_trans"]))
    extra = {k[len("extra_"):]: z[k] for k in z.files if k.startswith("extra_")}
    return tom, tbo, jnp.asarray(z["convergence"]), extra


# -- orbax (sharded, async) -------------------------------------------------


def save_sharded(path: str, tree) -> None:
    """Orbax checkpoint of an arbitrary (possibly sharded) pytree — the
    multi-host path; NPZ is the single-host fallback."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), tree)
    ckptr.wait_until_finished()


def load_sharded(path: str, template):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)
