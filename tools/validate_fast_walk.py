"""Full validation of the fast-gait (0.2 m/s) configuration found by
tools/sweep_speed.py wave 0: swing 0.20 s / DS 0.30 s. Runs the complete
walk + settle (163 periods, as tests/test_engine_walking.py), prints the
metrics, and exits nonzero if any of the walking test's pass thresholds
(stability band, quiet settle, velocity tracking) is violated."""

import json

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from g1_locomotion_tpu.engine import tick as eng
from g1_locomotion_tpu.models import robot as rb
from g1_locomotion_tpu.models.robot import load_robot
from g1_locomotion_tpu.utils.cache import enable_persistent_cache
from g1_locomotion_tpu.wbid.stack import StackIndices

enable_persistent_cache()
model = load_robot("g1_23dof", dtype=jnp.float64)
cfg = eng.walking_config()
params = eng.walking_scenario(jnp.float64, n_steps=8.0, v_cmd=(0.2, 0.0))
params = params._replace(
    gait=params.gait._replace(
        swing_duration=jnp.asarray(0.20, jnp.float64),
        double_support_duration=jnp.asarray(0.30, jnp.float64),
    )
)
rollout = eng.make_rollout(model, cfg)
state = eng.init_state(model, cfg, jnp.float64)
final, logs = jax.jit(lambda s: rollout(s, params, 163))(state)

com = np.asarray(logs.com).reshape(-1, 3)
contact = np.asarray(logs.contact).reshape(-1, 4)
from g1_locomotion_tpu.core import rotations as rot

rpy = np.asarray(rot.quat_to_rpy(final.q[3:7]))
X = rb.fk(model, final.q)
idx = StackIndices.from_model(model)
feet_x = [float(rb.frame_pose(model, X, f).p[0]) for f in idx.feet]
t0, t1 = 1500, 4500
left_td = int(np.clip(np.diff((contact[:, 0] < 0.5).astype(int)), 0, 1).sum())
right_td = int(np.clip(np.diff((contact[:, 2] < 0.5).astype(int)), 0, 1).sum())
print(json.dumps({
    "finite": bool(np.isfinite(com).all()),
    "z_min": float(com[:, 2].min()),
    "y_max": float(np.abs(com[:, 1]).max()),
    "z_final": float(com[-1, 2]),
    "y_final": float(com[-1, 1]),
    "v_final_max": float(jnp.abs(final.v).max()),
    "rpy_final": [float(x) for x in rpy],
    "v_real_mid": float((com[t1, 0] - com[t0, 0]) / ((t1 - t0) * 1e-3)),
    "advance": float(com[-1, 0] - com[0, 0]),
    "feet_x": feet_x,
    "left_swings": left_td,
    "right_swings": right_td,
}, indent=1))

# Pass/fail thresholds mirroring tests/test_engine_walking.py.
v_cmd = 0.2
v_real = float((com[t1, 0] - com[t0, 0]) / ((t1 - t0) * 1e-3))
checks = {
    "finite": bool(np.isfinite(com).all()),
    "z_min > 0.45": bool(com[:, 2].min() > 0.45),
    "|y|_max < 0.2": bool(np.abs(com[:, 1]).max() < 0.2),
    "z_final ~ 0.598": bool(abs(float(com[-1, 2]) - 0.598) < 0.02),
    "quiet settle": bool(float(jnp.abs(final.v).max()) < 0.3),
    "upright": bool(np.abs(rpy[:2]).max() < 0.15),
    "4+4 swings": left_td == 4 and right_td == 4,
    "velocity tracking": bool(abs(v_real - v_cmd) < 0.2 * v_cmd + 0.02),
}
failed = [k for k, ok in checks.items() if not ok]
print(json.dumps({"checks": checks, "failed": failed}))
raise SystemExit(1 if failed else 0)
