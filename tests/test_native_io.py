"""Native threaded batch reader: parity with the pure-Python path.

The native path (pydrobert_tpu.native + utils.serial.tensor_entry) must be
invisible: identical arrays, identical loader batches, graceful fallback
when a file can't be mapped to one contiguous byte range.
"""

import os

import numpy as np
import pytest

from pydrobert_tpu import native
from pydrobert_tpu.data import SpectDataLoader, SpectDataSet, LangDataSet
from pydrobert_tpu.utils.serial import load_tensor, save_tensor, tensor_entry

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native IO library unavailable (no g++?)"
)


@pytest.mark.parametrize(
    "shape,dtype",
    [
        ((13, 7), np.float32),
        ((9,), np.int64),
        ((4, 3), np.int64),
        ((), np.float32),
        ((0, 5), np.float32),
    ],
)
def test_entry_and_read_match_load_tensor(tmp_path, shape, dtype):
    rng = np.random.RandomState(0)
    arr = np.asarray(rng.randn(*shape) * 10).astype(dtype).reshape(shape)
    pth = str(tmp_path / "x.pt")
    save_tensor(arr, pth)
    entry = tensor_entry(pth)
    assert entry is not None
    assert entry.shape == shape and entry.dtype == np.dtype(dtype)
    out = np.empty(entry.shape, entry.dtype)
    native.read_batch([(pth, entry.payload_offset, out)])
    np.testing.assert_array_equal(out, load_tensor(pth))


def test_entry_none_for_strided_tensor(tmp_path):
    torch = pytest.importorskip("torch")
    t = torch.randn(6, 4).t()  # non-contiguous view over the same storage
    pth = str(tmp_path / "strided.pt")
    torch.save(t, pth)
    assert tensor_entry(pth) is None  # falls back to load_tensor
    np.testing.assert_array_equal(load_tensor(pth), t.numpy())


def test_read_batch_missing_file_raises(tmp_path):
    out = np.empty((3,), np.float32)
    with pytest.raises(OSError):
        native.read_batch([(str(tmp_path / "nope.pt"), 0, out)])


def test_spect_loader_native_matches_python(populate_data_dir):
    from pydrobert_tpu.data import SpectDataLoaderParams

    root, *_ = populate_data_dir(num_utts=12)
    ds = SpectDataSet(root, suppress_alis=False, suppress_uttids=False)
    assert ds.native_batch_fetch(range(len(ds))) is not None

    def batches(use_native):
        os.environ["PYDROBERT_TPU_NATIVE_IO"] = "1" if use_native else "0"
        try:
            ds = SpectDataSet(root, suppress_alis=False)
            fetched = ds.native_batch_fetch([0, 1])
            assert (fetched is not None) == use_native
            params = SpectDataLoaderParams(batch_size=5)
            loader = SpectDataLoader(
                root, params=params, shuffle=True, seed=7,
                suppress_alis=False,
            )
            return [
                tuple(np.asarray(x) for x in b if x is not None)
                for b in loader
            ]
        finally:
            os.environ.pop("PYDROBERT_TPU_NATIVE_IO", None)

    nat, py = batches(True), batches(False)
    assert len(nat) == len(py)
    for bn, bp in zip(nat, py):
        assert len(bn) == len(bp)
        for an, ap in zip(bn, bp):
            np.testing.assert_array_equal(an, ap)


def test_spect_native_fetch_matches_items_with_transforms(populate_data_dir):
    from pydrobert_tpu.data import SpectDataParams

    root, *_ = populate_data_dir(num_utts=6)
    params = SpectDataParams(do_mvn=True, delta_order=2)
    ds = SpectDataSet(root, params=params, suppress_alis=False)
    fetched = ds.native_batch_fetch(range(len(ds)))
    assert fetched is not None
    for j in range(len(ds)):
        exp, act = ds[j], fetched[j]
        assert len(exp) == len(act)
        for e, a in zip(exp, act):
            if e is None:
                assert a is None
            else:
                np.testing.assert_array_equal(np.asarray(e), np.asarray(a))


def test_lang_native_fetch_matches_items(populate_data_dir):
    from pydrobert_tpu.data import LangDataParams

    root, *_ = populate_data_dir(num_utts=8, include_frame_shift=False)
    params = LangDataParams(sos=100, eos=101)
    ds = LangDataSet(
        os.path.join(root, "ref"), params=params, suppress_uttids=False
    )
    fetched = ds.native_batch_fetch(range(len(ds)))
    assert fetched is not None
    for j in range(len(ds)):
        (e_ref, e_id), (a_ref, a_id) = ds[j], fetched[j]
        assert e_id == a_id
        np.testing.assert_array_equal(e_ref, a_ref)


def test_index_cache_invalidates_on_rewrite(tmp_path):
    pth = str(tmp_path / "x.pt")
    save_tensor(np.arange(4, dtype=np.int64), pth)
    from pydrobert_tpu.data.datasets import _native_load_many

    (first,) = _native_load_many([pth])
    np.testing.assert_array_equal(first, np.arange(4))
    # rewrite with different shape/content; mtime_ns/size signature changes
    save_tensor(np.arange(9, dtype=np.int64) * 2, pth)
    (second,) = _native_load_many([pth])
    np.testing.assert_array_equal(second, np.arange(9) * 2)


def test_loader_prefetch_matches_sync(populate_data_dir):
    from pydrobert_tpu.data import SpectDataLoaderParams

    root, *_ = populate_data_dir(num_utts=11)
    params = SpectDataLoaderParams(batch_size=3)

    def batches(prefetch):
        loader = SpectDataLoader(
            root, params=params, shuffle=True, seed=3, prefetch=prefetch
        )
        return [tuple(np.asarray(x) for x in b) for b in loader]

    for a, b in zip(batches(0), batches(2)):
        assert len(a) == len(b)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)


def test_loader_prefetch_propagates_errors(populate_data_dir):
    from pydrobert_tpu.data import SpectDataLoaderParams

    root, *_ = populate_data_dir(num_utts=6)
    params = SpectDataLoaderParams(batch_size=2)
    loader = SpectDataLoader(root, params=params, prefetch=2)

    def bad_collate(seq):
        raise RuntimeError("boom")

    loader.collate_fn = bad_collate
    with pytest.raises(RuntimeError, match="boom"):
        list(loader)


def test_loader_prefetch_early_break_stops_worker(populate_data_dir):
    import threading

    from pydrobert_tpu.data import SpectDataLoaderParams

    root, *_ = populate_data_dir(num_utts=12)
    params = SpectDataLoaderParams(batch_size=2)
    loader = SpectDataLoader(root, params=params, prefetch=1)
    before = threading.active_count()
    for i, _ in enumerate(loader):
        if i == 1:
            break
    # generator close -> stop flag -> worker exits (joined with timeout)
    assert threading.active_count() <= before + 1


def test_loader_respects_subclass_getitem_override(populate_data_dir):
    from pydrobert_tpu.data import SpectDataLoaderParams

    root, *_ = populate_data_dir(num_utts=6)

    class Doubled(SpectDataSet):
        def get_utterance_tuple(self, idx):
            feat, ref = super().get_utterance_tuple(idx)
            return feat * 2, ref

    params = SpectDataLoaderParams(batch_size=3)
    base = SpectDataSet(root)
    loader = SpectDataLoader(Doubled(root), params=params, shuffle=False)
    ref_loader = SpectDataLoader(base, params=params, shuffle=False)
    # the subclass override must win over the inherited native fetch
    assert loader._native_fetch() is None
    assert ref_loader._native_fetch() is not None
    for (f2, *_), (f1, *_) in zip(loader, ref_loader):
        np.testing.assert_allclose(np.asarray(f2), 2 * np.asarray(f1))


def test_tar_native_fetch_matches_items(populate_data_dir, tmp_path):
    from pydrobert_tpu import command_line
    from pydrobert_tpu.data import SpectTarDataSet

    root, *_ = populate_data_dir(num_utts=9)
    tar = str(tmp_path / "out.tar")
    assert not command_line.torch_spect_data_dir_to_wds([root, tar])
    tds = SpectTarDataSet(
        tar, suppress_alis=False, suppress_uttids=False, tokens_only=False
    )
    fetched = tds.native_batch_fetch(range(len(tds)))
    assert fetched is not None
    # at least the feats should have gone through the native pread path
    assert any(v is not None for v in tds._native_entries.values())
    for j in range(len(tds)):
        exp, act = tds[j], fetched[j]
        assert exp[-1] == act[-1]
        for e, a in zip(exp[:-1], act[:-1]):
            if e is None:
                assert a is None
            else:
                np.testing.assert_array_equal(np.asarray(e), np.asarray(a))
    tds.close()


def test_tar_native_fetch_compressed_falls_back(populate_data_dir, tmp_path):
    import gzip
    import shutil

    from pydrobert_tpu import command_line
    from pydrobert_tpu.data import SpectTarDataSet

    root, *_ = populate_data_dir(num_utts=4)
    tar = str(tmp_path / "out.tar")
    assert not command_line.torch_spect_data_dir_to_wds([root, tar])
    gz = str(tmp_path / "out.tar.gz")
    with open(tar, "rb") as f_in, gzip.open(gz, "wb") as f_out:
        shutil.copyfileobj(f_in, f_out)
    tds = SpectTarDataSet(gz, suppress_alis=False)
    fetched = tds.native_batch_fetch(range(len(tds)))
    assert fetched is not None  # member-by-member fallback, same results
    assert all(v is None for v in tds._native_entries.values())
    for j in range(len(tds)):
        for e, a in zip(tds[j], fetched[j]):
            if e is None:
                assert a is None
            else:
                np.testing.assert_array_equal(np.asarray(e), np.asarray(a))
    tds.close()


def test_context_window_native_fetch_matches_items(populate_data_dir):
    from pydrobert_tpu.data import ContextWindowDataSet

    root, *_ = populate_data_dir(num_utts=5)
    ds = ContextWindowDataSet(root, left=2, right=1)
    fetched = ds.native_batch_fetch(range(len(ds)))
    assert fetched is not None
    for j in range(len(ds)):
        for e, a in zip(ds[j], fetched[j]):
            if e is None:
                assert a is None
            else:
                np.testing.assert_array_equal(np.asarray(e), np.asarray(a))
