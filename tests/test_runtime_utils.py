import json

import numpy as np

from gci_tpu.parallel.distributed import HostShard
from gci_tpu.utils.metrics import get_metrics, stage


def test_stage_metrics():
    m = get_metrics()
    m.reset()
    with stage("demo", items=100, unit="reads"):
        pass
    rows = [json.loads(line) for line in m.report().splitlines()]
    assert rows[-1]["stage"] == "demo"
    assert rows[-1]["items"] == 100
    assert "per_second" in rows[-1]
    m.reset()


def test_host_shard_files():
    s0 = HostShard(0, 3)
    s1 = HostShard(1, 3)
    s2 = HostShard(2, 3)
    paths = [f"f{i}" for i in range(7)]
    all_assigned = s0.files(paths) + s1.files(paths) + s2.files(paths)
    assert sorted(all_assigned) == sorted(paths)
    assert s0.files(paths) == ["f0", "f3", "f6"]


def test_host_shard_record_range():
    shards = [HostShard(i, 4) for i in range(4)]
    ranges = [s.record_range(10) for s in shards]
    covered = []
    for a, b in ranges:
        covered.extend(range(a, b))
    assert covered == list(range(10))


def test_accumulate_depth_device_backend_matches_numpy(rng):
    # forced device backend runs the pallas scan (interpret-free on the CPU
    # jax backend this test suite pins) and must equal the numpy path
    from gci_tpu.depth import GenomeLayout, accumulate_depth, accumulate_depth_numpy

    targets = {"a": 5000, "b": 3000}
    layout = GenomeLayout.from_targets(targets)
    tid = rng.integers(0, 2, size=200)
    lens = np.array([5000, 3000])
    start = rng.integers(0, 2500, size=200)
    end = np.minimum(start + rng.integers(10, 2000, size=200), lens[tid])
    want = accumulate_depth_numpy(layout, tid, start, end, 15)
    got = accumulate_depth(layout, tid, start, end, 15, backend="numpy")
    np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------------------
# auto backend resolution
# ---------------------------------------------------------------------------


def test_resolve_auto_backend_host_only():
    from gci_tpu.depth import resolve_auto_backend

    assert resolve_auto_backend(default_backend="cpu") == "events"


def test_resolve_auto_backend_colocated_tpu():
    from gci_tpu.depth import resolve_auto_backend

    assert (
        resolve_auto_backend(default_backend="tpu", dispatch_latency=0.0003)
        == "device"
    )


def test_resolve_auto_backend_tunneled_tpu():
    from gci_tpu.depth import resolve_auto_backend

    assert (
        resolve_auto_backend(default_backend="tpu", dispatch_latency=0.02)
        == "events"
    )


def test_resolve_auto_backend_env_override(monkeypatch):
    from gci_tpu.depth import resolve_auto_backend

    monkeypatch.setenv("GCI_AUTO_BACKEND", "numpy")
    assert (
        resolve_auto_backend(default_backend="tpu", dispatch_latency=0.0001)
        == "numpy"
    )


def test_resolve_auto_backend_tunnel_platform_no_device_touch(monkeypatch):
    """A tunnel plugin (axon) in the platform list resolves to events from
    the environment alone — initializing a remote backend just to pick the
    host backend measured 233s."""
    import gci_tpu.depth as d

    monkeypatch.setattr(d, "_AUTO_RESOLVED", None)
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.delenv("GCI_AUTO_BACKEND", raising=False)
    assert d.resolve_auto_backend() == "events"
