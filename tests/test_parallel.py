import jax
import jax.numpy as jnp
import numpy as np
import pytest

from g1_locomotion_tpu.parallel import mesh as pmesh


def test_virtual_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_vmap_matches_local():
    mesh = pmesh.scenario_mesh()

    def per_scenario(x):
        return jnp.sum(x**2)

    f = pmesh.sharded_vmap(mesh, per_scenario)
    xs = jnp.arange(64, dtype=jnp.float64).reshape(16, 4)
    out = f(pmesh.shard_batch(mesh, xs))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(jax.vmap(per_scenario)(xs)), rtol=1e-12
    )


def test_psum_statistics_reduction():
    mesh = pmesh.scenario_mesh()

    def per_scenario(x):
        return x * 2.0

    def reduce_fn(out):
        return jnp.sum(out)

    f = pmesh.sharded_vmap(mesh, per_scenario, reduce_fn=reduce_fn)
    xs = jnp.arange(16, dtype=jnp.float64)
    out, total = f(pmesh.shard_batch(mesh, xs))
    np.testing.assert_allclose(float(total), float(jnp.sum(xs * 2.0)))
    assert out.shape == (16,)


def test_mpc_sweep_sharded(g1):
    """Batched MPC solves sharded over the 8-device mesh match unsharded."""
    from g1_locomotion_tpu.mpc import solver as mpc
    from g1_locomotion_tpu.models import srbd

    dtype = jnp.float64
    cfg = mpc.MPCConfig(horizon=10)
    w = mpc.default_weights(dtype)
    params = srbd.default_params(dtype)
    N = cfg.horizon
    com = jnp.array([0.0527, 0.0, 0.598], dtype)
    feet = jnp.array(
        [[-0.05, 0.12, 0.0], [0.12, 0.12, 0.0], [-0.05, -0.12, 0.0], [0.12, -0.12, 0.0]],
        dtype,
    )
    x0 = jnp.zeros(13, dtype).at[3:6].set(com).at[12].set(srbd.GRAVITY)
    x_ref = jnp.tile(x0[None], (N, 1))
    contact = jnp.ones((N, 4), dtype)
    c_hor = jnp.tile(feet[None], (N, 1, 1))
    p_hor = jnp.tile(com[None], (N, 1))

    B = 16
    x0s = jnp.tile(x0[None], (B, 1)).at[:, 4].add(jnp.linspace(-0.02, 0.02, B))

    mesh = pmesh.scenario_mesh()
    solve = lambda x: mpc.solve(cfg, w, params, x, x_ref, contact, c_hor, p_hor).u0
    f_shard = pmesh.sharded_vmap(mesh, solve)
    u_shard = f_shard(pmesh.shard_batch(mesh, x0s))
    u_local = jax.jit(jax.vmap(solve))(x0s)
    np.testing.assert_allclose(np.asarray(u_shard), np.asarray(u_local), atol=1e-6)


def test_randomize_shapes():
    from g1_locomotion_tpu.engine import tick as eng
    from g1_locomotion_tpu.parallel import sweep

    base = eng.default_scenario(jnp.float64)
    spec = sweep.SweepSpec(n_scenarios=32)
    params = sweep.randomize(spec, jax.random.PRNGKey(0), base)
    assert params.v_cmd.shape == (32, 2)
    assert params.srbd.mass.shape == (32,)
    assert params.gait.swing_duration.shape == (32,)
    # Ranges respected.
    assert float(params.wbid_gains.mu.min()) >= 0.5
    assert float(params.wbid_gains.mu.max()) <= 1.0
