"""Native C++ loader parity tests vs the pure-Python reader."""

import numpy as np
import pytest

from ev2hands_tpu.events.native_loader import NativeEv2HandSLoader, native_available
from ev2hands_tpu.events.streams import Ev2HandSReader, write_synthetic_ev2hands_s

pytestmark = pytest.mark.skipif(
    not native_available(), reason="csrc loader not built"
)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("native") / "train")
    write_synthetic_ev2hands_s(root, n_events=16384, n_frames=8, width=64, height=48)
    return root


def test_native_matches_python_reader(dataset):
    n_events = 256
    native = NativeEv2HandSLoader(dataset, n_events=n_events)
    py = Ev2HandSReader(dataset, n_events=n_events)

    starts = np.array([0, 100, 5000, 16384 - n_events], np.int64)
    batch = native.fill_batch(len(starts), starts=starts)
    for i, s in enumerate(starts):
        ref = py.window(int(s))
        np.testing.assert_array_equal(batch["events"][i], ref["events"])
        np.testing.assert_array_equal(batch["labels"][i], ref["labels"])
        np.testing.assert_array_equal(
            batch["left"]["trans"][i], ref["left"]["trans"]
        )
        assert batch["left"]["valid"][i] == ref["left"]["valid"]


def test_native_random_batches_deterministic(dataset):
    a = NativeEv2HandSLoader(dataset, n_events=128, seed=7)
    b = NativeEv2HandSLoader(dataset, n_events=128, seed=7)
    ba = a.fill_batch(4, step=3)
    bb = b.fill_batch(4, step=3)
    np.testing.assert_array_equal(ba["events"], bb["events"])
    # a different step gives different windows
    bc = a.fill_batch(4, step=4)
    assert not np.array_equal(ba["events"], bc["events"])


def test_native_out_of_range_start_clamped(dataset):
    native = NativeEv2HandSLoader(dataset, n_events=256)
    batch = native.fill_batch(1, starts=np.array([10**9], np.int64))
    assert np.isfinite(batch["events"]).all()


def test_native_len(dataset):
    native = NativeEv2HandSLoader(dataset, n_events=128)
    assert len(native) == 16384


def test_native_short_table_wraps(tmp_path):
    """A table shorter than one window must wrap, not read out of bounds
    (previously fill_window copied n_events rows past the buffer)."""
    root = str(tmp_path / "short")
    write_synthetic_ev2hands_s(root, n_events=100, n_frames=2, width=64, height=48)
    n_events = 256  # > table length (100 rows)
    native = NativeEv2HandSLoader(root, n_events=n_events)
    batch = native.fill_batch(2, starts=np.array([0, 40], np.int64))
    assert batch["events"].shape == (2, n_events, 4)
    assert np.isfinite(batch["events"]).all()
    # wrapped rows repeat the table contents
    np.testing.assert_array_equal(batch["events"][0, 100], batch["events"][0, 0])
    # random path routes through the same guard
    rnd = native.fill_batch(2, step=0)
    assert np.isfinite(rnd["events"]).all()
