"""Budget-saturation guard: naive binned-engine configs on demanding
maps/clouds must get corrected budgets or a loud diagnostic — never
silently wrong likelihoods (VERDICT r1 #3; the exact reference engine has
no budgets, so parity means safety by default)."""

import warnings

import numpy as np
import jax.numpy as jnp
import pytest

from rmcl_tpu.bvh.builder import build_bvh
from rmcl_tpu.config.tree import ParamTree
from rmcl_tpu.geom.map import MeshMap
from rmcl_tpu.geom.mesh import make_room_scene
from rmcl_tpu.math.se3 import Transform
from rmcl_tpu.mcl.node import MCLConfig, MCLNode
from rmcl_tpu.mcl.sensor_update import SensorUpdateConfig
from rmcl_tpu.sensors.models import SphericalModel
from rmcl_tpu.sensors.simulate import simulate


def _world():
    mesh = make_room_scene((12.0, 10.0, 3.0), n_pillars=6, seed=11)
    mm = MeshMap.from_mesh(mesh, bin_size=8, bins_per_super=8)
    model = SphericalModel.create(
        width=90, height=4, phi_min=-0.2, phi_max=0.2,
        theta_min=-np.pi, theta_max=np.pi, range_min=0.1, range_max=30.0,
    )
    true_pose = Transform.from_xyz_euler(
        jnp.asarray([1.0, 0.5, 1.0]), jnp.asarray([0.0, 0.0, 0.7])
    )
    return mm, model, true_pose


def _naive_node(mm, auto_budget):
    return MCLNode(
        mm,
        MCLConfig(
            n_particles=512,
            auto_budget=auto_budget,
            sensor=SensorUpdateConfig.create(
                samples=32, dist_sigma=0.4, engine="binned",
                c_super=4, c_bin=6,  # naive: saturates on this map
            ),
            seed=2,
        ),
    )


@pytest.mark.slow
def test_mcl_auto_budget_corrects_and_scores_right():
    mm, model, true_pose = _world()
    node = _naive_node(mm, auto_budget=True)
    node.global_localization((-5.0, -4.0, 0.8, 0, 0, -np.pi),
                             (5.0, 4.0, 1.2, 0, 0, np.pi))
    hits = simulate(node.bvh, model, true_pose)
    node.sensor_update(hits.point, hits.hit, Transform.identity())
    assert node.config.sensor.c_bin > 6, "saturated budgets were not raised"

    # corrected budgets -> likelihoods match the exact engine
    ref = MCLNode(
        mm.bvh,
        MCLConfig(n_particles=512,
                  sensor=SensorUpdateConfig.create(samples=32, dist_sigma=0.4),
                  seed=2),
    )
    ref.global_localization((-5.0, -4.0, 0.8, 0, 0, -np.pi),
                            (5.0, 4.0, 1.2, 0, 0, np.pi))
    ref.sensor_update(hits.point, hits.hit, Transform.identity())
    a = np.asarray(node.cloud.likelihood.mean)
    b = np.asarray(ref.cloud.likelihood.mean)
    close = np.isclose(a, b, rtol=1e-3, atol=1e-3)
    assert close.mean() > 0.97, f"only {close.mean():.2%} close"


def test_mcl_warns_without_auto_budget():
    mm, model, true_pose = _world()
    node = _naive_node(mm, auto_budget=False)
    node.global_localization((-5.0, -4.0, 0.8, 0, 0, -np.pi),
                             (5.0, 4.0, 1.2, 0, 0, np.pi))
    hits = simulate(node.bvh, model, true_pose)
    with pytest.warns(UserWarning, match="saturate"):
        node.sensor_update(hits.point, hits.hit, Transform.identity())
    assert node.config.sensor.c_bin == 6  # untouched, but loudly flagged


def test_mcl_generous_budgets_untouched():
    mm, model, true_pose = _world()
    node = MCLNode(
        mm,
        MCLConfig(
            n_particles=256,
            sensor=SensorUpdateConfig.create(
                samples=32, dist_sigma=0.4, engine="binned",
                c_super=64, c_bin=512,
            ),
            seed=2,
        ),
    )
    node.initial_pose_guess(true_pose)
    hits = simulate(node.bvh, model, true_pose)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        node.sensor_update(hits.point, hits.hit, Transform.identity())
    assert node.config.sensor.c_bin == 512


def test_micp_auto_budget_corrects():
    from rmcl_tpu.micp.node import MICPLocalization

    mm, model, true_pose = _world()
    node = MICPLocalization(
        mm,
        ParamTree.from_flat({
            "engine": "binned",
            "engine_options.c_super": 4,
            "engine_options.c_bin": 6,
            "sensors.lidar.correspondences.max_dist": 1.0,
        }),
    )
    hits = simulate(mm.bvh, model, true_pose)
    node.set_static_dataset("lidar", model, hits.point, hits.hit)
    node.on_odometry(Transform.identity(), stamp=0.0)
    node.set_pose(true_pose)
    node.step()
    assert node.micp_config.c_bin > 6, "saturated budgets were not raised"
