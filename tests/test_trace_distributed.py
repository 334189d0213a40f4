"""jax.profiler trace hooks + multi-host init no-op path (SURVEY §5/§2.7)."""

import glob
import os

import jax
import jax.numpy as jnp

from vst.core.trace import ChainTimer, annotate, profile_trace
from vst.parallel import create_mesh, initialize_distributed


def test_initialize_distributed_single_host_noop():
    assert initialize_distributed() == 1
    # mesh creation unchanged afterwards
    m = create_mesh()
    assert "data" in m.axis_names


def test_profile_trace_disabled_is_noop(monkeypatch, tmp_path):
    monkeypatch.delenv("VST_PROFILE_DIR", raising=False)
    with profile_trace():
        jnp.ones(4).sum().block_until_ready()
    assert list(tmp_path.iterdir()) == []


def test_profile_trace_writes_xplane(monkeypatch, tmp_path):
    monkeypatch.setenv("VST_PROFILE_DIR", str(tmp_path))
    with profile_trace():
        with annotate("unit-test-phase"):
            jnp.ones(16).sum().block_until_ready()
    files = glob.glob(str(tmp_path / "**" / "*"), recursive=True)
    assert any(os.path.isfile(f) for f in files)


def test_chain_timer():
    t = ChainTimer()
    x = jnp.ones(8)
    for _ in range(3):
        with t:
            x = x * 2.0
            t.sink(x)
    assert len(t.times_ms) == 3
    assert t.mean_ms > 0
