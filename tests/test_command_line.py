"""CLI tests: round trips, golden sclite comparison, in-process argv calls
(mirroring the reference's tests/test_command_line.py strategy)."""

import io
import os
import tarfile
import warnings

import numpy as np
import pytest

from pydrobert_tpu import command_line
from pydrobert_tpu.utils.serial import load_tensor, save_tensor

SCLITE_DIR = "/root/reference/tests/sclite"


def _write_token2id(path, ids=range(20)):
    with open(path, "w") as f:
        for i in ids:
            f.write(f"tok{i} {i}\n")
    return path


def _console_entry_points():
    """The console scripts from pyproject.toml (the reference smoke-tests
    every installed command's --help in tox; reference tox.ini:27-43)."""
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    txt = open(os.path.join(root, "pyproject.toml")).read()
    return dict(
        re.findall(
            r'^([\w-]+) = "pydrobert_tpu\.command_line:(\w+)"', txt, re.M
        )
    )


def test_all_commands_have_help(capsys):
    # every pyproject console script resolves and its --help exits 0, and
    # the installed surface is exactly command_line.__all__ (no orphan
    # either way); commands catch SystemExit and return the exit code
    eps = _console_entry_points()
    assert sorted(eps.values()) == sorted(command_line.__all__)
    for script, name in eps.items():
        cmd = getattr(command_line, name)
        assert not cmd(["--help"]), script
        assert "usage:" in capsys.readouterr().out


def test_trn_round_trip(tmp_path):
    token2id = _write_token2id(str(tmp_path / "token2id"))
    trn_in = str(tmp_path / "in.trn")
    with open(trn_in, "w") as f:
        f.write("tok1 tok2 tok3 (utt_a)\ntok4 (utt_b)\ntok0 tok0 (utt_c)\n")
    ref_dir = str(tmp_path / "ref")
    assert not command_line.trn_to_torch_token_data_dir(
        [trn_in, token2id, ref_dir]
    )
    ref = load_tensor(os.path.join(ref_dir, "utt_a.pt"))
    np.testing.assert_array_equal(ref[:, 0], [1, 2, 3])
    trn_out = str(tmp_path / "out.trn")
    assert not command_line.torch_token_data_dir_to_trn(
        [ref_dir, token2id, trn_out, "--swap"]
    )
    lines = sorted(open(trn_out).read().splitlines())
    assert lines == [
        "tok0 tok0 (utt_c)",
        "tok1 tok2 tok3 (utt_a)",
        "tok4 (utt_b)",
    ]


def test_ctm_round_trip(tmp_path):
    token2id = _write_token2id(str(tmp_path / "token2id"))
    ctm_in = str(tmp_path / "in.ctm")
    with open(ctm_in, "w") as f:
        f.write(
            "utt_a A 0.0 0.1 tok1\nutt_a A 0.1 0.2 tok2\nutt_b A 0.5 0.5 tok3\n"
        )
    ref_dir = str(tmp_path / "ref")
    assert not command_line.ctm_to_torch_token_data_dir(
        [ctm_in, token2id, ref_dir]
    )
    ref = load_tensor(os.path.join(ref_dir, "utt_a.pt"))
    assert ref.shape == (2, 3)
    ctm_out = str(tmp_path / "out.ctm")
    assert not command_line.torch_token_data_dir_to_ctm(
        [ref_dir, token2id, ctm_out, "--swap"]
    )
    back = [line.split() for line in open(ctm_out).read().splitlines()]
    exp = [
        ["utt_a", "A", 0.0, 0.1, "tok1"],
        ["utt_a", "A", 0.1, 0.2, "tok2"],
        ["utt_b", "A", 0.5, 0.5, "tok3"],
    ]
    for b, e in zip(back, exp):
        assert b[:2] == e[:2] and b[4] == e[4]
        assert abs(float(b[2]) - e[2]) < 1e-9
        assert abs(float(b[3]) - e[3]) < 1e-9


def test_textgrid_round_trip(tmp_path):
    token2id = _write_token2id(str(tmp_path / "token2id"))
    ref_dir = str(tmp_path / "ref")
    os.makedirs(ref_dir)
    save_tensor(
        np.asarray([[1, 0, 10], [2, 10, 30]], np.int64),
        os.path.join(ref_dir, "utt_a.pt"),
    )
    tg_dir = str(tmp_path / "tg")
    assert not command_line.torch_token_data_dir_to_textgrids(
        [ref_dir, token2id, tg_dir, "--infer", "--swap"]
    )
    assert os.path.exists(os.path.join(tg_dir, "utt_a.TextGrid"))
    ref_dir2 = str(tmp_path / "ref2")
    assert not command_line.textgrids_to_torch_token_data_dir(
        [tg_dir, token2id, ref_dir2]
    )
    back = load_tensor(os.path.join(ref_dir2, "utt_a.pt"))
    np.testing.assert_array_equal(back, [[1, 0, 10], [2, 10, 30]])


@pytest.mark.skipif(
    not os.path.isdir(SCLITE_DIR), reason="sclite fixtures unavailable"
)
def test_error_rates_match_sclite(tmp_path):
    """Reproduce NIST sclite's own scores (reference golden test,
    tests/test_command_line.py:496)."""
    token2id = os.path.join(SCLITE_DIR, "token2id.txt")
    ref_dir, hyp_dir = str(tmp_path / "ref"), str(tmp_path / "hyp")
    assert not command_line.trn_to_torch_token_data_dir(
        [os.path.join(SCLITE_DIR, "ref.trn"), token2id, ref_dir]
    )
    assert not command_line.trn_to_torch_token_data_dir(
        [os.path.join(SCLITE_DIR, "hyp.trn"), token2id, hyp_dir]
    )
    total_act = str(tmp_path / "total.txt")
    per_utt_act = str(tmp_path / "per_utt.txt")
    assert not command_line.compute_torch_token_data_dir_error_rates(
        [ref_dir, hyp_dir, total_act, "--nist-costs", "--quiet"]
    )
    assert not command_line.compute_torch_token_data_dir_error_rates(
        [ref_dir, hyp_dir, per_utt_act, "--nist-costs", "--per-utt", "--quiet"]
    )
    exp, act = {}, {}
    for fn, d in (
        (os.path.join(SCLITE_DIR, "per_utt.txt"), exp),
        (per_utt_act, act),
    ):
        with open(fn) as f:
            for line in f:
                utt, v = line.strip().split()
                d[utt] = f"{float(v):.03f}"
    assert exp == act
    total_exp = f"{float(open(os.path.join(SCLITE_DIR, 'total.txt')).read()):.03f}"
    total_act = f"{float(open(total_act).read()):.03f}"
    assert total_exp == total_act


def test_data_dir_info(populate_data_dir, tmp_path):
    root, feats, alis, refs, _ = populate_data_dir(num_utts=5)
    out = str(tmp_path / "info.txt")
    assert not command_line.get_torch_spect_data_dir_info([root, out])
    kv = dict(
        line.split() for line in open(out).read().splitlines()
    )
    assert int(kv["num_utterances"]) == 5
    assert int(kv["num_filts"]) == feats[0].shape[1]
    assert int(kv["total_frames"]) == sum(f.shape[0] for f in feats)
    assert int(kv["total_tokens"]) == sum(len(r) for r in refs)
    assert int(kv["max_ali_class"]) == max(a.max() for a in alis)
    # count_<i> sums to total frames
    total = sum(int(v) for k, v in kv.items() if k.startswith("count_"))
    assert total == sum(len(a) for a in alis)


def test_ali_token_round_trip(tmp_path):
    ali_dir = str(tmp_path / "ali")
    os.makedirs(ali_dir)
    ali = np.asarray([0, 0, 1, 1, 1, 2, 0, 0], np.int64)
    save_tensor(ali, os.path.join(ali_dir, "utt_a.pt"))
    ref_dir = str(tmp_path / "ref")
    assert not command_line.torch_ali_data_dir_to_torch_token_data_dir(
        [ali_dir, ref_dir]
    )
    ref = load_tensor(os.path.join(ref_dir, "utt_a.pt"))
    np.testing.assert_array_equal(
        ref, [[0, 0, 2], [1, 2, 5], [2, 5, 6], [0, 6, 8]]
    )
    ali_dir2 = str(tmp_path / "ali2")
    assert not command_line.torch_token_data_dir_to_torch_ali_data_dir(
        [ref_dir, ali_dir2]
    )
    np.testing.assert_array_equal(
        load_tensor(os.path.join(ali_dir2, "utt_a.pt")), ali
    )


def test_mvn_stats(populate_data_dir, tmp_path):
    root, feats, *_ = populate_data_dir(num_utts=6)
    out = str(tmp_path / "mvn.pkl")
    assert not command_line.compute_mvn_stats_for_torch_feat_data_dir(
        [os.path.join(root, "feat"), out]
    )
    import pickle

    stats = pickle.load(open(out, "rb"))
    all_feats = np.concatenate(feats, 0)
    np.testing.assert_allclose(stats["mean"], all_feats.mean(0), atol=1e-4)
    np.testing.assert_allclose(stats["std"], all_feats.std(0), atol=1e-4)


def test_textgrids_num_workers(populate_data_dir, tmp_path):
    """--num-workers fans textgrid writing out over a process pool with
    identical outputs to the serial path."""
    root, feats, alis, refs, utt_ids = populate_data_dir(num_utts=6)
    id2token = tmp_path / "id2token.txt"
    toks = sorted(set(int(x) for r in refs for x in np.asarray(r)[..., 0].flatten()))
    id2token.write_text("".join(f"tok{t} {t}\n".replace("tok", "w") for t in toks))
    ser_dir, par_dir = str(tmp_path / "tg_ser"), str(tmp_path / "tg_par")
    ref_dir = os.path.join(root, "ref")
    base = [ref_dir, str(id2token), "--swap", "--infer"]
    assert not command_line.torch_token_data_dir_to_textgrids(
        base[:2] + [ser_dir] + base[2:]
    )
    assert not command_line.torch_token_data_dir_to_textgrids(
        base[:2] + [par_dir] + base[2:] + ["--num-workers", "2"]
    )
    ser = sorted(os.listdir(ser_dir))
    assert ser == sorted(os.listdir(par_dir)) and len(ser) == 6
    for name in ser:
        assert (
            open(os.path.join(ser_dir, name)).read()
            == open(os.path.join(par_dir, name)).read()
        )


def test_wds_export(populate_data_dir, tmp_path):
    root, feats, alis, refs, utt_ids = populate_data_dir(num_utts=7)
    tar = str(tmp_path / "out.tar")
    assert not command_line.torch_spect_data_dir_to_wds([root, tar])
    with tarfile.open(tar) as tf:
        names = tf.getnames()
    assert len(names) == 21
    assert f"{utt_ids[0]}.feat.pth" in names
    # sharding
    assert not command_line.torch_spect_data_dir_to_wds(
        [root, tar, "--shard", "--max-samples-per-shard", "3"]
    )
    assert os.path.exists(tar + ".0") and os.path.exists(tar + ".2")


def test_subset(populate_data_dir, tmp_path):
    root, feats, _, _, utt_ids = populate_data_dir(num_utts=10)
    dest = str(tmp_path / "subset")
    assert not command_line.subset_torch_spect_data_dir(
        [root, dest, "--first-n", "3"]
    )
    assert sorted(
        x[: -len(".pt")] for x in os.listdir(os.path.join(dest, "feat"))
    ) == sorted(utt_ids)[:3]
    assert os.path.isdir(os.path.join(dest, "ali"))
    dest2 = str(tmp_path / "subset2")
    assert not command_line.subset_torch_spect_data_dir(
        [root, dest2, "--shortest-n", "2", "--copy"]
    )
    lens = sorted((f.shape[0], u) for f, u in zip(feats, utt_ids))
    expect = sorted(x[1] for x in lens[:2])
    assert sorted(
        x[: -len(".pt")] for x in os.listdir(os.path.join(dest2, "feat"))
    ) == expect
    dest3 = str(tmp_path / "subset3")
    assert not command_line.subset_torch_spect_data_dir(
        [root, dest3, "--utt-list", utt_ids[2], utt_ids[5]]
    )
    assert len(os.listdir(os.path.join(dest3, "feat"))) == 2


def test_chunk(populate_data_dir, tmp_path):
    root, feats, alis, refs, utt_ids = populate_data_dir(
        num_utts=3, max_width=12
    )
    out_dir = str(tmp_path / "chunked")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        assert not command_line.chunk_torch_spect_data_dir(
            [root, out_dir, "--policy", "fixed", "--lobe-size", "1",
             "--pad-mode", "constant", "--quiet"]
        )
    out_feats = os.listdir(os.path.join(out_dir, "feat"))
    assert len(out_feats) >= 3
    one = load_tensor(os.path.join(out_dir, "feat", sorted(out_feats)[0]))
    assert one.ndim == 2 and one.shape[1] == feats[0].shape[1]


def test_length_moments(tmp_path, capsys):
    ali_dir = str(tmp_path / "ali")
    os.makedirs(ali_dir)
    save_tensor(
        np.asarray([0, 0, 1, 1, 1, 2], np.int64),
        os.path.join(ali_dir, "utt_a.pt"),
    )
    assert not command_line.print_torch_ali_data_dir_length_moments([ali_dir])
    out = capsys.readouterr().out.strip()
    # segments 2, 3, 1 -> mean 2, var 2/3
    assert out == "2.000 (0.667)"
    ref_dir = str(tmp_path / "ref")
    os.makedirs(ref_dir)
    save_tensor(
        np.asarray([[0, 0, 4], [1, 4, 6]], np.int64),
        os.path.join(ref_dir, "utt_a.pt"),
    )
    assert not command_line.print_torch_ref_data_dir_length_moments(
        [ref_dir, "--std"]
    )
    out = capsys.readouterr().out.strip()
    assert out == "3.000 (1.000)"


def test_arpa_lm_to_state_dict_round_trip(tmp_path):
    import jax.numpy as jnp

    from pydrobert_tpu.command_line import (
        arpa_lm_to_state_dict,
        print_arpa_lm_state_dict_info,
    )
    from pydrobert_tpu.lm import LookupLanguageModel

    arpa = """\
\\data\\
ngram 1=5
ngram 2=3

\\1-grams:
-0.8 <s> -0.3
-0.9 </s>
-0.5 a -0.2
-0.6 b -0.25
-1.1 c

\\2-grams:
-0.4 <s> a
-0.3 a b
-0.7 b </s>

\\end\\
"""
    arpa_file = tmp_path / "lm.arpa"
    arpa_file.write_text(arpa)
    t2i_file = tmp_path / "token2id.txt"
    t2i_file.write_text("<s> 3\n</s> 4\na 0\nb 1\nc 2\n")
    out = tmp_path / "lm.npz"
    assert not arpa_lm_to_state_dict(
        [str(arpa_file), str(t2i_file), str(out), "--keep-base-10"]
    )
    loaded = LookupLanguageModel(1, sos=0)
    loaded.load_state_dict(dict(np.load(out)))
    from pydrobert_tpu.data import parse_arpa_lm

    direct = LookupLanguageModel(
        5,
        sos=3,
        prob_dicts=parse_arpa_lm(
            io.StringIO(arpa),
            {"<s>": 3, "</s>": 4, "a": 0, "b": 1, "c": 2},
            to_base_e=False,
        ),
    )
    hist = jnp.asarray(np.array([[0, 1], [1, 4], [2, 0]]))
    np.testing.assert_allclose(
        np.asarray(loaded(hist)), np.asarray(direct(hist)), atol=1e-6
    )

    info_file = tmp_path / "info.txt"
    assert not print_arpa_lm_state_dict_info([str(out), str(info_file)])
    info = dict(
        line.split() for line in info_file.read_text().splitlines()
    )
    assert info["vocab_size"] == "5"
    assert info["sos"] == "3"
    assert info["max_ngram"] == "2"
    assert int(info["order2_contexts"]) >= 3


def test_logit_dir_forced_align(tmp_path):
    """torch-logit-data-dir-to-torch-ali-data-dir writes Viterbi CTC
    alignments that collapse back to the reference tokens, round-tripping
    through torch-ali-data-dir-to-torch-token-data-dir (blanks removed)."""
    rng = np.random.RandomState(11)
    logit_dir = str(tmp_path / "logit")
    ref_dir = str(tmp_path / "ref")
    ali_dir = str(tmp_path / "ali")
    os.makedirs(logit_dir)
    os.makedirs(ref_dir)
    V, blank = 7, 6
    truths = {}
    for i, (T, U) in enumerate([(12, 3), (9, 4), (40, 1), (5, 0)]):
        utt = f"utt_{i}.pt"
        toks = rng.randint(0, blank, (U,)).astype(np.int64)
        logits = rng.randn(T, V).astype(np.float32)
        # boost the true tokens' logits at spread-out frames so the
        # alignment is non-degenerate
        for u, t in enumerate(np.linspace(0, T - 1, max(U, 1), dtype=int)[:U]):
            logits[t, toks[u]] += 8.0
        save_tensor(logits, os.path.join(logit_dir, utt))
        # one utterance exercises the (R, 3) segment-file branch
        ref = (
            np.stack([toks, np.arange(U), np.arange(U) + 1], 1)
            if i == 1
            else toks
        )
        save_tensor(ref, os.path.join(ref_dir, utt))
        truths[utt] = toks
    assert not command_line.torch_logit_data_dir_to_torch_ali_data_dir(
        [logit_dir, ref_dir, ali_dir, "--blank-idx", str(blank)]
    )
    for i, (utt, toks) in enumerate(truths.items()):
        ali = np.asarray(load_tensor(os.path.join(ali_dir, utt)))
        T = {0: 12, 1: 9, 2: 40, 3: 5}[i]
        assert ali.shape == (T,) and ali.dtype == np.int64
        collapsed = [
            t
            for j, t in enumerate(ali)
            if t != blank and (j == 0 or t != ali[j - 1])
        ]
        assert collapsed == list(toks), utt
    # infeasible alignment warns but still writes
    save_tensor(
        rng.randn(2, V).astype(np.float32), os.path.join(logit_dir, "bad.pt")
    )
    save_tensor(
        np.asarray([0, 0, 0], np.int64), os.path.join(ref_dir, "bad.pt")
    )
    with pytest.warns(UserWarning, match="no alignment"):
        command_line.torch_logit_data_dir_to_torch_ali_data_dir(
            [logit_dir, ref_dir, ali_dir, "--blank-idx", str(blank)]
        )
    assert os.path.exists(os.path.join(ali_dir, "bad.pt"))
