"""DataModule (Lightning-analogue) and deprecated-shim tests."""

import os
import warnings

import numpy as np
import pytest

from pydrobert_tpu import command_line
from pydrobert_tpu.data import SpectDataLoaderParams
from pydrobert_tpu.datamodule import (
    SpectDataModule,
    SpectDataModuleParams,
)


def test_params_split_merge_logic():
    p = SpectDataModuleParams()
    assert not p.loader_params_are_split
    assert not p.loader_params_are_merged
    p.initialize_missing()
    assert p.loader_params_are_split
    assert p.params_for("train") is not None
    # predict falls back to the test partition's params (reference
    # _pl_data.py:449-453); raw attribute stays unset
    assert p.predict is None
    assert p.params_for("predict") is p.params_for("test")
    p2 = SpectDataModuleParams(common=SpectDataLoaderParams(batch_size=5))
    assert p2.params_for("train").batch_size == 5
    p2.train = SpectDataLoaderParams()
    with pytest.raises(ValueError):
        p2.params_for("train")
    # predict dir falls back to test dir
    p3 = SpectDataModuleParams(test_dir="/tmp/x")
    assert p3.dir_for("predict") == "/tmp/x"


def test_spect_data_module_end_to_end(populate_data_dir, tmp_path):
    root, feats, alis, refs, utt_ids = populate_data_dir(num_utts=8)
    info = str(tmp_path / "info.txt")
    assert not command_line.get_torch_spect_data_dir_info([root, info])
    mvn = str(tmp_path / "mvn.pkl")
    assert not command_line.compute_mvn_stats_for_torch_feat_data_dir(
        [os.path.join(root, "feat"), mvn]
    )
    params = SpectDataModuleParams(
        common=SpectDataLoaderParams(batch_size=4, do_mvn=True),
        train_dir=root,
        val_dir=root,
        info_path=info,
        mvn_path=mvn,
    )
    dm = SpectDataModule(params, batch_first=True, seed=4)
    dm.setup("fit")
    assert dm.num_filts == feats[0].shape[1]
    assert dm.vocab_size == max(r[:, 0].max() for r in refs) + 1
    assert dm.max_ali_class == max(a.max() for a in alis)
    assert dm.batch_size == 4
    # epoch-deterministic resume across fresh loaders
    ep1_a = [b[0] for b in dm.train_dataloader(1)]
    ep1_b = [b[0] for b in dm.train_dataloader(1)]
    for a, b in zip(ep1_a, ep1_b):
        np.testing.assert_array_equal(a, b)
    # val loader doesn't shuffle by default
    v1 = [b[0] for b in dm.val_dataloader(0)]
    v2 = [b[0] for b in dm.val_dataloader(3)]
    for a, b in zip(v1, v2):
        np.testing.assert_array_equal(a, b)


def test_deprecated_shims_warn_and_forward():
    import importlib
    import sys

    for name in ("pydrobert_tpu.layers", "pydrobert_tpu.util"):
        sys.modules.pop(name, None)
        with pytest.warns(DeprecationWarning):
            mod = importlib.import_module(name)
        assert hasattr(mod, "spec_augment")
    import pydrobert_tpu.layers as layers

    assert hasattr(layers, "BeamSearch")
