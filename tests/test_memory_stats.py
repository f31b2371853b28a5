"""Memory statistics / profiler hooks (MemoryManagerStatistic analog)."""

import os

import jax.numpy as jnp
import numpy as np

from open3d_tpu.utils import memory as mem


def test_live_array_stats_sees_allocations():
    before = mem.live_array_stats()
    big = jnp.ones((1024, 1024), jnp.float32) + 1  # force materialization
    _ = float(big[0, 0])
    after = mem.live_array_stats()
    total_b = sum(s["bytes"] for s in before.values())
    total_a = sum(s["bytes"] for s in after.values())
    assert total_a >= total_b + 4 * 1024 * 1024
    del big


def test_memory_report_runs():
    out = mem.memory_report("test")
    assert "live arrays" in out


def test_exit_leak_report_armable():
    mem.enable_exit_leak_report()
    mem.enable_exit_leak_report()  # idempotent


def test_profiler_trace_writes_xplane(tmp_path):
    logdir = str(tmp_path / "prof")
    with mem.trace(logdir):
        with mem.annotate("work"):
            x = jnp.ones((256, 256)) @ jnp.ones((256, 256))
            _ = float(x[0, 0])
    found = []
    for root, _, files in os.walk(logdir):
        found += [f for f in files if f.endswith((".xplane.pb", ".trace.json.gz"))]
    assert found, f"no profiler output under {logdir}"


def test_device_memory_profile(tmp_path):
    p = str(tmp_path / "mem.prof")
    mem.save_device_memory_profile(p)
    assert os.path.getsize(p) > 0
