"""Multi-host helpers (parallel/distributed.py): no-op detection on a
single host and the per-process batch-slice arithmetic (hardware-free)."""
import pytest

from cc_tpu.parallel import (initialize_distributed, process_batch_slice,
                             is_primary)


def test_initialize_noop_on_single_host(monkeypatch):
    for var in ("JAX_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES",
                "MEGASCALE_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(var, raising=False)
    assert initialize_distributed() is False
    assert is_primary()


def test_process_batch_slice_partition():
    n, B = 4, 32
    rows = []
    for p in range(n):
        s = process_batch_slice(B, process_index=p, process_count=n)
        rows.extend(range(s.start, s.stop))
        assert s.stop - s.start == B // n
    assert rows == list(range(B))


def test_process_batch_slice_rejects_ragged():
    with pytest.raises(ValueError):
        process_batch_slice(10, process_index=0, process_count=4)


def test_process_batch_slice_defaults_to_runtime():
    s = process_batch_slice(8)  # single process: whole batch
    assert (s.start, s.stop) == (0, 8)
