"""Data pipeline tests: datasets, validation, samplers, loaders.

Mirrors the reference's strategy: synthetic data dirs
(``populate_torch_dir``), deterministic-shuffle checks, and the
distributed test's oracle — the union of per-rank batches must equal the
serial run (reference ``tests/test_dataloaders.py:818-907``), here with
rank/world patched instead of spawning processes.
"""

import os
import warnings

import numpy as np
import pytest

from pydrobert_tpu import config
from pydrobert_tpu.data import (
    BucketBatchSampler,
    ContextWindowDataLoader,
    ContextWindowDataLoaderParams,
    ContextWindowDataSet,
    EpochRandomSampler,
    EpochSequentialSampler,
    LangDataLoader,
    LangDataLoaderParams,
    SpectDataLoader,
    SpectDataLoaderParams,
    SpectDataParams,
    SpectDataSet,
    extract_window,
    validate_spect_data_set,
)
from pydrobert_tpu.utils.serial import load_tensor, save_tensor


def test_spect_data_set_reads_back(populate_data_dir, seeded):
    root, feats, alis, refs, utt_ids = populate_data_dir(num_utts=8)
    ds = SpectDataSet(root, suppress_alis=False, tokens_only=False)
    assert ds.utt_ids == tuple(sorted(utt_ids))
    assert len(ds) == 8
    for i in range(8):
        feat, ali, ref = ds[i]
        np.testing.assert_array_equal(feat, feats[i])
        np.testing.assert_array_equal(ali, alis[i])
        np.testing.assert_array_equal(ref, refs[i])
    # sos/eos insertion on (R, 3) refs gets (-1, -1) bounds
    params = SpectDataParams(sos=100, eos=101)
    ds2 = SpectDataSet(
        root, params=params, suppress_alis=False, tokens_only=False
    )
    _, _, ref = ds2[0]
    assert tuple(ref[0]) == (100, -1, -1)
    assert tuple(ref[-1]) == (101, -1, -1)
    np.testing.assert_array_equal(ref[1:-1], refs[0])
    # subset ids
    params3 = SpectDataParams(subset_ids=[utt_ids[0], utt_ids[3]])
    ds3 = SpectDataSet(root, params=params3)
    assert ds3.utt_ids == tuple(sorted([utt_ids[0], utt_ids[3]]))


def test_spect_data_set_transforms(populate_data_dir, seeded):
    root, feats, _, _, _ = populate_data_dir(num_utts=4, max_width=20)
    ds = SpectDataSet(root, params=SpectDataParams(delta_order=2))
    feat, _ = ds[0]
    assert feat.shape == (feats[0].shape[0], 3 * feats[0].shape[1])
    ds2 = SpectDataSet(root, params=SpectDataParams(do_mvn=True))
    feat2, _ = ds2[1]
    assert feat2.shape == feats[1].shape


def test_write_hyp_and_pdf(populate_data_dir, tmp_path, seeded):
    root, _, _, _, utt_ids = populate_data_dir(num_utts=3)
    ds = SpectDataSet(root, params=SpectDataParams(sos=50, eos=51))
    hyp = np.asarray([50, 3, 4, 5, 51, 9])
    ds.write_hyp(0, hyp)
    back = load_tensor(
        str(tmp_path / "hyp" / (utt_ids[0] + ".pt"))
    )
    np.testing.assert_array_equal(back, [3, 4, 5])
    ds.write_pdf(1, np.random.randn(7, 11))
    pdf = load_tensor(str(tmp_path / "pdfs" / (utt_ids[1] + ".pt")))
    assert pdf.shape == (7, 11) and pdf.dtype == np.float32


def test_validate_spect_data_set(populate_data_dir, tmp_path, seeded):
    root, feats, alis, refs, utt_ids = populate_data_dir(num_utts=4)
    ds = SpectDataSet(root, suppress_alis=False, tokens_only=False)
    validate_spect_data_set(ds)  # clean dir passes
    # break an ali: int32 dtype -> fixable
    ali_path = str(tmp_path / "ali" / (utt_ids[1] + ".pt"))
    save_tensor(alis[1].astype(np.int32), ali_path)
    with pytest.raises(ValueError, match="not a long"):
        validate_spect_data_set(ds)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        validate_spect_data_set(ds, fix=1)
    assert load_tensor(ali_path).dtype == np.int64
    # break a ref: end bound beyond T -> fixable within fix
    T = feats[2].shape[0]
    bad_ref = np.asarray([[1, 0, T + 1]], np.int64)
    ref_path = str(tmp_path / "ref" / (utt_ids[2] + ".pt"))
    save_tensor(bad_ref, ref_path)
    with pytest.raises(ValueError, match="exceeding"):
        validate_spect_data_set(ds)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        validate_spect_data_set(ds, fix=1)
    np.testing.assert_array_equal(load_tensor(ref_path), [[1, 0, T]])
    # ali longer than feats -> cropped
    save_tensor(
        np.concatenate([alis[3], [0]]).astype(np.int64),
        str(tmp_path / "ali" / (utt_ids[3] + ".pt")),
    )
    with pytest.raises(ValueError, match="first dimension"):
        validate_spect_data_set(ds)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        validate_spect_data_set(ds, fix=1)
    validate_spect_data_set(ds)


def test_epoch_random_sampler_deterministic(seeded):
    class _Sized(list):
        pass

    data = _Sized(range(50))
    s = EpochRandomSampler(data, base_seed=7)
    ep0 = list(s)
    ep1 = list(s)
    assert ep0 != ep1
    assert list(s.get_samples_for_epoch_ignoring_distributed(0)) == ep0
    assert list(s.get_samples_for_epoch_ignoring_distributed(1)) == ep1
    s2 = EpochRandomSampler(data, base_seed=7, init_epoch=1)
    assert list(s2) == ep1
    assert sorted(ep0) == list(range(50))


def test_samplers_shard_across_ranks(seeded, monkeypatch):
    import pydrobert_tpu.data.dataloaders as dl

    data = list(range(24))
    serial = list(EpochRandomSampler(data, base_seed=3))
    gathered = []
    for rank in range(3):
        monkeypatch.setattr(dl, "_dist_info", lambda r=rank: (r, 3))
        s = EpochRandomSampler(data, base_seed=3)
        shard = list(s)
        assert len(shard) == 8 == len(s)
        gathered.append(shard)
    # union of per-rank shards == serial stream (the reference's oracle)
    interleaved = [
        gathered[i % 3][i // 3] for i in range(24)
    ]
    assert interleaved == serial
    # uneven: raise by default, 'drop' truncates, 'uneven' keeps all
    data = list(range(25))
    monkeypatch.setattr(dl, "_dist_info", lambda: (0, 3))
    with pytest.raises(ValueError):
        EpochSequentialSampler(data)
    s = EpochSequentialSampler(data, on_uneven_distributed="drop")
    assert len(list(s)) == 8
    s = EpochSequentialSampler(data, on_uneven_distributed="uneven")
    assert len(list(s)) == 9


def test_bucket_batch_sampler_reference_example():
    # the reference's docstring example (_dataloaders.py:306-318)
    N = 14
    sampler = list(range(N))
    idx2bucket = dict((n, int(n % 3 == 0)) for n in range(N))
    bucket2size = {0: 2, 1: 2}
    bsampler = BucketBatchSampler(sampler, idx2bucket, bucket2size, True)
    assert list(bsampler) == [[1, 2], [0, 3], [4, 5], [7, 8], [6, 9], [10, 11]]
    bsampler = BucketBatchSampler(sampler, idx2bucket, bucket2size, False)
    assert list(bsampler) == [
        [1, 2], [0, 3], [4, 5], [7, 8], [6, 9], [10, 11], [13], [12],
    ]


def test_spect_data_loader(populate_data_dir, seeded):
    root, feats, alis, refs, utt_ids = populate_data_dir(num_utts=10)
    params = SpectDataLoaderParams(batch_size=3)
    dl = SpectDataLoader(
        root, params, shuffle=False, seed=0,
        suppress_alis=False, tokens_only=False,
    )
    seen = 0
    for feats_b, alis_b, refs_b, feat_sizes, ref_sizes in dl:
        N = feat_sizes.shape[0]
        seen += N
        assert feats_b.shape[0] == N  # batch_first
        assert feats_b.shape[1] == feat_sizes.max()
        assert alis_b.shape == feats_b.shape[:2]
        # padding values
        for n in range(N):
            Tn = feat_sizes[n]
            assert (feats_b[n, Tn:] == 0).all()
            assert (alis_b[n, Tn:] == config.INDEX_PAD_VALUE).all()
            assert (refs_b[n, ref_sizes[n]:] == config.INDEX_PAD_VALUE).all()
    assert seen == 10
    assert len(dl) == 4


def test_spect_data_loader_epoch_resumption(populate_data_dir, seeded):
    root, *_ = populate_data_dir(num_utts=9)
    params = SpectDataLoaderParams(batch_size=2)
    dl_a = SpectDataLoader(root, params, seed=11)
    ep0_a = [b[0] for b in dl_a]
    ep1_a = [b[0] for b in dl_a]
    dl_b = SpectDataLoader(root, params, seed=11, init_epoch=1)
    ep1_b = [b[0] for b in dl_b]
    assert len(ep1_a) == len(ep1_b)
    for a, b in zip(ep1_a, ep1_b):
        np.testing.assert_array_equal(a, b)
    assert dl_b.epoch == 2
    dl_b.epoch = 0
    ep0_b = [b[0] for b in dl_b]
    for a, b in zip(ep0_a, ep0_b):
        np.testing.assert_array_equal(a, b)


def test_spect_data_loader_bucketing(populate_data_dir, seeded):
    root, *_ = populate_data_dir(num_utts=20, max_width=30)
    params = SpectDataLoaderParams(
        batch_size=2, num_length_buckets=4, size_batch_by_length=True
    )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        dl = SpectDataLoader(root, params, shuffle=False, seed=0)
    seen = 0
    for feats_b, refs_b, feat_sizes, ref_sizes in dl:
        seen += feat_sizes.shape[0]
        # bucketed batches: lengths within a batch fall in one bucket
        assert feat_sizes.shape[0] >= 1
    assert seen == 20


def test_lang_data_loader(populate_data_dir, seeded, tmp_path):
    root, _, _, refs, utt_ids = populate_data_dir(num_utts=6)
    params = LangDataLoaderParams(batch_size=2, eos=99)
    dl = LangDataLoader(str(tmp_path / "ref"), params, shuffle=False)
    seen = 0
    for refs_b, ref_sizes in dl:
        seen += ref_sizes.shape[0]
        for n in range(ref_sizes.shape[0]):
            assert refs_b[n, ref_sizes[n] - 1] == 99  # appended eos
    assert seen == 6


def test_context_window_dataset_and_loader(populate_data_dir, seeded):
    root, feats, alis, _, _ = populate_data_dir(num_utts=5)
    ds = ContextWindowDataSet(root, left=2, right=1)
    windows, ali = ds[0]
    T, F = feats[0].shape
    assert windows.shape == (T, 4, F)
    np.testing.assert_array_equal(windows[0, 2], feats[0][0])
    np.testing.assert_array_equal(
        windows[0], extract_window(feats[0], 0, 2, 1)
    )
    # edge padding replicates the boundary frame
    np.testing.assert_array_equal(windows[0, 0], feats[0][0])
    params = ContextWindowDataLoaderParams(
        batch_size=2, context_left=2, context_right=1
    )
    dl = ContextWindowDataLoader(root, params, shuffle=False)
    total = 0
    for windows_b, alis_b in dl:
        assert windows_b.shape[1:] == (4, F)
        assert windows_b.shape[0] == alis_b.shape[0]
        total += windows_b.shape[0]
    assert total == sum(f.shape[0] for f in feats)


def test_loader_sharding_emits_jax_arrays(populate_data_dir, seeded):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    from pydrobert_tpu.parallel import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    root, *_ = populate_data_dir(num_utts=8)
    mesh = make_mesh()
    sharding = NamedSharding(mesh, PartitionSpec("data"))
    params = SpectDataLoaderParams(
        batch_size=len(jax.devices()), drop_last=True
    )
    dl = SpectDataLoader(root, params, shuffle=False, sharding=sharding)
    batch = next(iter(dl))
    feats_b = batch[0]
    assert isinstance(feats_b, jax.Array)
    assert feats_b.sharding.is_equivalent_to(sharding, feats_b.ndim)


def test_spect_tar_data_set_round_trip(populate_data_dir, tmp_path):
    """torch-spect-data-dir-to-wds export reads back identically through
    SpectTarDataSet (random access, iteration, sharding + glob)."""
    from pydrobert_tpu import command_line
    from pydrobert_tpu.data import SpectDataSet, SpectTarDataSet

    root, feats, alis, refs, utt_ids = populate_data_dir(num_utts=7)
    tar = str(tmp_path / "out.tar")
    assert not command_line.torch_spect_data_dir_to_wds([root, tar])
    disk = SpectDataSet(
        root, suppress_alis=False, suppress_uttids=False, tokens_only=False
    )
    tds = SpectTarDataSet(
        tar, suppress_alis=False, suppress_uttids=False, tokens_only=False
    )
    assert tds.utt_ids == disk.utt_ids
    assert tds.has_ali and tds.has_ref
    for i in range(len(disk)):
        f0, a0, r0, u0 = disk[i]
        f1, a1, r1, u1 = tds[i]
        assert u0 == u1
        np.testing.assert_array_equal(f0, f1)
        np.testing.assert_array_equal(a0, a1)
        np.testing.assert_array_equal(r0, r1)
    # iteration streams every utterance exactly once
    seen = sorted(t[-1] for t in tds)
    assert seen == sorted(utt_ids)
    tds.close()

    # sharded export + glob pattern
    assert not command_line.torch_spect_data_dir_to_wds(
        [root, tar, "--shard", "--max-samples-per-shard", "3"]
    )
    sharded = SpectTarDataSet(tar + ".*", suppress_uttids=False)
    assert sharded.utt_ids == disk.utt_ids
    f1, r1, u1 = sharded[2]
    f0, _, r0, u0 = disk[2]
    assert u0 == u1
    np.testing.assert_array_equal(f0, f1)
    sharded.close()


def test_spect_tar_data_set_params_and_loader(populate_data_dir, tmp_path):
    """params handling (sos/eos, subset_ids) matches SpectDataSet, and the
    tar dataset plugs into the standard loader unchanged."""
    from pydrobert_tpu import command_line
    from pydrobert_tpu.data import (
        SpectDataLoader,
        SpectDataParams,
        SpectDataSet,
        SpectTarDataSet,
    )

    root, feats, alis, refs, utt_ids = populate_data_dir(num_utts=6)
    tar = str(tmp_path / "p.tar")
    assert not command_line.torch_spect_data_dir_to_wds([root, tar])
    params = SpectDataParams(sos=1, eos=2)
    disk = SpectDataSet(root, params=params)
    tds = SpectTarDataSet(tar, params=params)
    for i in range(len(disk)):
        f0, r0 = disk[i]
        f1, r1 = tds[i]
        np.testing.assert_array_equal(f0, f1)
        np.testing.assert_array_equal(r0, r1)
    sub = SpectTarDataSet(tar, subset_ids={utt_ids[0], utt_ids[3]})
    assert len(sub) == 2
    from pydrobert_tpu.data import SpectDataLoaderParams

    lp = SpectDataLoaderParams(batch_size=3)
    loader = SpectDataLoader(tds, params=lp, shuffle=False)
    batch = next(iter(loader))
    assert batch[0].shape[0] == 3
    tds.close()


def test_context_window_collate_uttids_four_tuple():
    """has_uttids collation returns (windows, alis, window_sizes, uttids)
    exactly like the reference (_dataloaders.py:1254-1285)."""
    from pydrobert_tpu.data import context_window_seq_to_batch

    seq = [
        (np.zeros((3, 5, 2)), np.arange(3), "utt_a"),
        (np.ones((2, 5, 2)), np.arange(2), "utt_b"),
    ]
    windows, alis, window_sizes, uttids = context_window_seq_to_batch(
        seq, has_uttids=True
    )
    assert windows.shape == (5, 5, 2)
    assert alis.shape == (5,)
    np.testing.assert_array_equal(window_sizes, [3, 2])
    assert uttids == ("utt_a", "utt_b")


def test_suppress_alis_ignores_partial_ali_dir(populate_data_dir, tmp_path):
    """A partial ali/ dir must not shrink the dataset when alis are
    suppressed (reference gates has_ali on 'and not suppress_alis')."""
    from pydrobert_tpu.data import SpectDataSet

    root, feats, alis, refs, utt_ids = populate_data_dir(num_utts=6)
    # delete most ali files
    ali_dir = os.path.join(root, "ali")
    for utt in utt_ids[1:]:
        os.remove(os.path.join(ali_dir, utt + ".pt"))
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # no 'Missing ali' warnings either
        ds = SpectDataSet(root, suppress_alis=True)
    assert len(ds) == 6
    with pytest.warns(UserWarning):
        ds2 = SpectDataSet(root, suppress_alis=False)
    assert len(ds2) == 1


def test_validate_rejects_negative_ref_tokens(populate_data_dir):
    from pydrobert_tpu.data import SpectDataSet, validate_spect_data_set
    from pydrobert_tpu.utils.serial import load_tensor, save_tensor

    root, feats, alis, refs, utt_ids = populate_data_dir(num_utts=2)
    pth = os.path.join(root, "ref", utt_ids[0] + ".pt")
    ref = load_tensor(pth)
    ref[0, 0] = -3
    save_tensor(ref, pth)
    ds = SpectDataSet(
        root, suppress_alis=False, suppress_uttids=False, tokens_only=False
    )
    with pytest.raises(ValueError, match="negative reference token"):
        validate_spect_data_set(ds)


def test_spect_tar_duplicate_shards_yield_once(populate_data_dir, tmp_path):
    """An utt id present in two shards streams exactly once (first shard
    wins, consistent with random access)."""
    from pydrobert_tpu import command_line
    from pydrobert_tpu.data import SpectTarDataSet

    root, feats, alis, refs, utt_ids = populate_data_dir(num_utts=3)
    tar_a = str(tmp_path / "a.tar")
    tar_b = str(tmp_path / "b.tar")
    assert not command_line.torch_spect_data_dir_to_wds([root, tar_a])
    assert not command_line.torch_spect_data_dir_to_wds([root, tar_b])
    tds = SpectTarDataSet(
        [tar_a, tar_b],
        suppress_alis=False,
        suppress_uttids=False,
        tokens_only=False,
    )
    assert len(tds) == 3
    streamed = [t[-1] for t in tds]
    assert sorted(streamed) == sorted(utt_ids)


def test_collate_pad_controls():
    """pad_to_multiple quantizes padded lengths (bounding the number of
    distinct XLA compilations); feat_pad_to/ref_pad_to fix them outright
    (required by multihost DP: every process's batch must share one global
    shape) and raise when an element exceeds the fixed size."""
    from pydrobert_tpu.data import lang_seq_to_batch, spect_seq_to_batch

    feats = [np.random.randn(t, 4).astype(np.float32) for t in (3, 5)]
    refs = [np.arange(2, dtype=np.int64), np.arange(7, dtype=np.int64)]
    f, r, fs, rs = spect_seq_to_batch(
        list(zip(feats, refs)), has_alis=False, pad_to_multiple=8
    )
    assert f.shape == (2, 8, 4) and r.shape == (2, 8)
    assert list(fs) == [5, 3] and list(rs) == [7, 2]  # sorted by feat len
    f, r, _, _ = spect_seq_to_batch(
        list(zip(feats, refs)), has_alis=False, feat_pad_to=10, ref_pad_to=9
    )
    assert f.shape == (2, 10, 4) and r.shape == (2, 9)
    assert (r[:, 7:] == -100).all()
    with pytest.raises(ValueError, match="exceeds"):
        spect_seq_to_batch(
            list(zip(feats, refs)), has_alis=False, feat_pad_to=4
        )
    r2, _ = lang_seq_to_batch(refs, ref_pad_to=12)
    assert r2.shape == (2, 12)


def test_loader_pad_controls(populate_data_dir):
    """Loader-level shape controls produce identical padded shapes across
    batches regardless of per-batch max lengths."""
    from pydrobert_tpu.data import SpectDataLoader, SpectDataLoaderParams

    root, _, _, _, _ = populate_data_dir(
        num_utts=8, max_width=9, include_ali=False
    )
    loader = SpectDataLoader(
        str(root),
        SpectDataLoaderParams(batch_size=4),
        shuffle=False,
        suppress_uttids=True,
        feat_pad_to=16,
        ref_pad_to=8,
    )
    shapes = {tuple(b[0].shape) + tuple(b[1].shape) for b in loader}
    assert len(shapes) == 1
    ((N, T, F, N2, U),) = shapes
    assert (N, T, U) == (4, 16, 8)
