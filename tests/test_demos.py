"""Smoke tests for the BASELINE-config demo entry points (tiny sizes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from g1_locomotion_tpu.api import demos


def test_gait_sweep_small():
    out = demos.demo_gait_sweep(batch=32, dtype=jnp.float64)
    assert out["batch"] == 32
    assert out["max_pri_res"] < 1e-4
    assert out["solves_per_s"] > 0


def test_pod_sweep_small():
    out = demos.demo_pod_sweep(scenarios=8, n_periods=1, dtype=jnp.float64)
    assert out["scenarios"] == 8
    assert np.isfinite(out["mean_com_drift"])
    assert 0.0 <= out["fell_fraction"] <= 1.0


def test_cli_parses():
    """CLI wiring: argparse paths resolve (no execution)."""
    from g1_locomotion_tpu.api.cli import main

    with pytest.raises(SystemExit):
        main(["--help"])
