"""Native C++ record gather vs the numpy memmap reader."""
import numpy as np
import pytest

from cocodr_tpu.data.native import (
    NativeTokenCache,
    build_native,
    native_available,
)
from cocodr_tpu.data.records import RecordWriter, TokenCache


@pytest.fixture(scope="module")
def record_file(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("rec") / "passages")
    rng = np.random.RandomState(0)
    with RecordWriter(p, max_len=32) as w:
        for i in range(500):
            n = rng.randint(1, 33)
            w.write(rng.randint(1, 30000, size=n).tolist())
    return p


def test_native_matches_numpy(record_file):
    if not build_native():
        pytest.skip("no C++ toolchain")
    assert native_available()
    ref = TokenCache(record_file)
    nat = NativeTokenCache(record_file, n_threads=3)
    assert len(nat) == len(ref) == 500

    rng = np.random.RandomState(1)
    idx = rng.randint(0, 500, size=200)
    ref_lens, ref_toks = ref.batch(idx)
    nat_lens, nat_toks = nat.batch(idx)
    np.testing.assert_array_equal(ref_lens, nat_lens)
    np.testing.assert_array_equal(ref_toks, nat_toks)

    ref_t, ref_m = ref.batch_with_mask(idx)
    nat_t, nat_m = nat.batch_with_mask(idx)
    np.testing.assert_array_equal(ref_t, nat_t)
    np.testing.assert_array_equal(ref_m, nat_m)
    nat.close()


def test_native_out_of_range(record_file):
    if not build_native():
        pytest.skip("no C++ toolchain")
    nat = NativeTokenCache(record_file)
    with pytest.raises(IndexError):
        nat.batch([500])
    with pytest.raises(IndexError):
        nat.batch([-1])
    nat.close()
