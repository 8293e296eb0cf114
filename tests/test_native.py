"""Native C++ IO library vs the pure-Python paths (skipped if not built)."""

import numpy as np
import pytest

from gmrm_tpu.io.native import have_native, native_read_block, native_parse_phen

needs_native = pytest.mark.skipif(
    not have_native(), reason="_native/libgmrm_io.so not built"
)


@needs_native
def test_native_read_block(tmp_path, rng):
    data = rng.integers(0, 256, size=1 << 20).astype(np.uint8)
    p = tmp_path / "blob.bin"
    data.tofile(p)
    got = native_read_block(str(p), 100, 1 << 18)
    np.testing.assert_array_equal(got, data[100:100 + (1 << 18)])
    # Multi-threaded path.
    got = native_read_block(str(p), 0, data.size, n_threads=4)
    np.testing.assert_array_equal(got, data)


@needs_native
def test_native_read_missing_file():
    with pytest.raises(IOError):
        native_read_block("/nonexistent/file.bin", 0, 10)


@needs_native
def test_native_parse_phen(tmp_path):
    p = tmp_path / "x.phen"
    p.write_text("1 1 0.5\n2 2 NA\n3 3 -1.25e2\n4 4\t 3.0\n")
    vals, isna = native_parse_phen(str(p), 10)
    assert vals.shape == (4,)
    np.testing.assert_array_equal(isna, [False, True, False, False])
    np.testing.assert_allclose(vals[[0, 2, 3]], [0.5, -125.0, 3.0])


@needs_native
def test_native_phen_matches_python(tmp_path, rng):
    import gmrm_tpu.io.phen as phen_mod

    n = 1003
    vals = rng.normal(size=n)
    na_idx = set(rng.choice(n, 31, replace=False).tolist())
    p = tmp_path / "big.phen"
    with open(p, "w") as fh:
        for i in range(n):
            v = "NA" if i in na_idx else repr(float(vals[i]))
            fh.write(f"{i} {i} {v}\n")
    # Native path is used when n_expected is given; omitting it forces the
    # pure-Python parser (see read_phen).
    ph_native = phen_mod.read_phen(str(p), n)
    ph_py = phen_mod.read_phen(str(p))
    assert ph_native.nas == ph_py.nas == 31
    np.testing.assert_allclose(ph_native.epsilon0, ph_py.epsilon0, rtol=1e-12)
