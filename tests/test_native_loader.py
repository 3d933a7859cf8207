"""Native feature loader vs numpy reference (npz stored+deflated, npy,
missing files, threading)."""

import os
import zipfile

import numpy as np
import pytest

from instructany2pix_tpu.train import native_loader


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native_loader.native_available():
        if not native_loader.build_native():
            pytest.skip("native toolchain unavailable")


def _write_features(tmp_path, n=16, dim=32, compress=False):
    rs = np.random.RandomState(0)
    paths, expect = [], []
    for i in range(n):
        p = str(tmp_path / f"f{i}.npz")
        state = rs.randn(dim).astype(np.float32)
        if compress:
            np.savez_compressed(p, state=state)
        else:
            np.savez(p, state=state)
        paths.append(p)
        expect.append(state)
    return paths, np.stack(expect)


def test_native_matches_numpy_stored(tmp_path):
    paths, expect = _write_features(tmp_path, compress=False)
    out = native_loader.load_feature_batch(paths, 32, n_threads=4)
    np.testing.assert_allclose(out, expect)


def test_native_matches_numpy_deflated(tmp_path):
    paths, expect = _write_features(tmp_path, compress=True)
    out = native_loader.load_feature_batch(paths, 32, n_threads=4)
    np.testing.assert_allclose(out, expect)


def test_missing_file_gives_zero_row(tmp_path):
    paths, expect = _write_features(tmp_path, n=3)
    paths.insert(1, str(tmp_path / "nope.npz"))
    out = native_loader.load_feature_batch(paths, 32)
    np.testing.assert_allclose(out[0], expect[0])
    assert np.all(out[1] == 0)
    np.testing.assert_allclose(out[2], expect[1])


def test_raw_npy_and_truncation(tmp_path):
    x = np.arange(64, dtype=np.float32)
    p = str(tmp_path / "raw.npy")
    np.save(p, x)
    out = native_loader.load_feature_batch([p], 32)
    np.testing.assert_allclose(out[0], x[:32])  # truncates to dim
    out2 = native_loader.load_feature_batch([p], 128)
    np.testing.assert_allclose(out2[0, :64], x)
    assert np.all(out2[0, 64:] == 0)  # zero-padded


def test_large_batch_threaded(tmp_path):
    paths, expect = _write_features(tmp_path, n=200, dim=64)
    out = native_loader.load_feature_batch(paths, 64, n_threads=16)
    np.testing.assert_allclose(out, expect)


def test_media_map_batched_matches_single(tmp_path):
    from instructany2pix_tpu.train.data import MediaMap

    rs = np.random.RandomState(0)
    mapping = {}
    for name in ["a", "b"]:
        np.savez(tmp_path / f"{name}.npz", state=rs.randn(16).astype(np.float32))
        mapping[name] = f"{name}.npz"
    mm = MediaMap(mapping, root=str(tmp_path), dim=16)
    batch = mm.get_batch(["a", "b", "unknown"])
    np.testing.assert_allclose(batch[0], mm.get("a"), rtol=1e-6)
    np.testing.assert_allclose(batch[1], mm.get("b"), rtol=1e-6)
    assert np.all(batch[2] == 0)


def test_directory_path_is_survivable(tmp_path):
    # a directory path must fail gracefully (zero row), not abort —
    # regression for the ftell-on-directory bad_alloc crash
    out = native_loader.load_feature_batch([str(tmp_path)], 8)
    assert np.all(out == 0)
