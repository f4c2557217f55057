"""Checkpoint/resume of an interrupted pod sweep (SURVEY.md §5 checkpoint row,
BASELINE config 5): demo_pod_sweep saves (states, stats, chunk) after every
segment and a re-invocation picks up from the last finished segment."""

import jax.numpy as jnp
import numpy as np
import pytest

from g1_locomotion_tpu.api import demos
from g1_locomotion_tpu.utils import checkpoint as ckpt


@pytest.mark.slow
def test_pod_sweep_resume(tmp_path):
    path = str(tmp_path / "sweep_ckpt")

    # "Interrupted" run: only the first of two chunks executes.
    out1 = demos.demo_pod_sweep(
        scenarios=8, n_periods=2, checkpoint_path=path, chunks=1
    )
    assert ckpt.exists(path)
    assert out1["chunks_run"] == 1

    # Resume: chunk 0 is skipped, only chunk 1 runs.
    out2 = demos.demo_pod_sweep(
        scenarios=8, n_periods=2, checkpoint_path=path, chunks=2
    )
    assert out2["chunks_run"] == 1
    assert np.isfinite(out2["mean_com_drift"])
    # The resumed run continued from saved states: accumulated drift grows.
    assert out2["mean_com_drift"] >= 0.0

    # Chunk-exactness (VERDICT round-2 weak #5): the resumed 2-chunk sweep
    # must report the SAME statistics as one unchunked run of the same
    # total length — drift measured from the run-start CoM, fell from the
    # whole-run min height.
    out_unchunked = demos.demo_pod_sweep(scenarios=8, n_periods=4)
    np.testing.assert_allclose(
        out2["mean_com_drift"], out_unchunked["mean_com_drift"],
        rtol=1e-9, atol=1e-12,
    )
    assert out2["fell_fraction"] == out_unchunked["fell_fraction"]
