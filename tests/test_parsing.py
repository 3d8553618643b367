"""Parsing parity tests vs the reference pydrobert-pytorch."""

import io
import warnings

import numpy as np
import pytest

from pydrobert_tpu.data import (
    parse_arpa_lm,
    read_ctm,
    read_textgrid,
    read_trn,
    token_to_transcript,
    transcript_to_token,
    write_ctm,
    write_textgrid,
    write_trn,
)

ARPA = r"""
some garbage
\data\
ngram 1=5
ngram 2=6
ngram 3=2

\1-grams:
-1.384 <s> -0.30
-1.0 </s>
-0.7 a -0.5
-0.9 b -0.4
-1.2 c

\2-grams:
-0.30 <s> a -0.2
-0.5 a b -0.1
-0.6 b a -0.15
-0.4 a </s>
-0.9 b </s>
-1.1 c a 0.0

\3-grams:
-0.2 <s> a b
-0.3 a b a

\end\
"""


@pytest.fixture(scope="session")
def ref_parsing():
    import sys

    if "/root/reference/src" not in sys.path:
        sys.path.insert(0, "/root/reference/src")
    try:
        # pydrobert.torch.data pulls in the `param` package (not installed);
        # the parsing implementation module has no such dependency
        import pydrobert.torch._parsing as ref_data
    except ImportError:
        pytest.skip("reference library unavailable")
    return ref_data


def test_parse_arpa_lm_matches_reference(ref_parsing):
    ours = parse_arpa_lm(io.StringIO(ARPA), to_base_e=True)
    theirs = ref_parsing.parse_arpa_lm(io.StringIO(ARPA), to_base_e=True)
    assert len(ours) == len(theirs) == 3
    for od, td in zip(ours, theirs):
        assert set(od) == set(td)
        for k in od:
            np.testing.assert_allclose(od[k], td[k], rtol=1e-6)


def test_parse_arpa_lm_token2id_and_errors():
    t2i = {"<s>": 5, "</s>": 6, "a": 0, "b": 1, "c": 2}
    pd = parse_arpa_lm(io.StringIO(ARPA), token2id=t2i, to_base_e=False)
    assert pd[0][5] == (-1.384, -0.30)
    assert pd[1][(5, 0)] == (-0.30, -0.2)
    assert pd[2][(5, 0, 1)] == -0.2
    with pytest.raises(IOError):
        parse_arpa_lm(io.StringIO("no data header here"), to_base_e=True)
    bad = ARPA.replace("ngram 2=6", "ngram 2=7")
    with pytest.raises(IOError):
        parse_arpa_lm(io.StringIO(bad), to_base_e=True)


TRN = """\
here is a simple line (utt1)
 this has { an / alternate } in it (utt2)
a / slash and } unmatched close (utt3)
(utt4)
"""


def test_read_trn_matches_reference(ref_parsing):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ours = read_trn(io.StringIO(TRN))
        theirs = ref_parsing.read_trn(io.StringIO(TRN))
    assert ours == theirs
    assert ours[0] == ("utt1", ["here", "is", "a", "simple", "line"])
    assert ours[1][1][2] == ([["an"], ["alternate"]], -1, -1)


def test_trn_round_trip(ref_parsing):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        transcripts = read_trn(io.StringIO(TRN))
        buf = io.StringIO()
        write_trn(transcripts, buf)
        buf.seek(0)
        again = read_trn(buf)
    assert [t[0] for t in again] == [t[0] for t in transcripts]
    assert again[0][1] == transcripts[0][1]
    # reference writes alternates the same way
    buf2 = io.StringIO()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ref_parsing.write_trn(transcripts, buf2)
    assert buf.getvalue() == buf2.getvalue()


CTM = """\
;; a comment
wfn1 A 0.1 1.0 hello
wfn1 A 1.2 0.5 there ;; trailing comment
wfn2 B 0.0 0.25 what
wfn1 A 0.05 0.05 well
"""


def test_read_ctm_matches_reference(ref_parsing):
    ours = read_ctm(io.StringIO(CTM))
    theirs = ref_parsing.read_ctm(io.StringIO(CTM))
    assert ours == theirs
    wc2utt = {("wfn1", "A"): "u1", ("wfn2", "B"): "u2"}
    ours = read_ctm(io.StringIO(CTM), wc2utt)
    theirs = ref_parsing.read_ctm(io.StringIO(CTM), wc2utt)
    assert ours == theirs
    with pytest.raises(ValueError):
        read_ctm(io.StringIO("wfn A -1.0 0.5 neg"))


def test_ctm_round_trip(ref_parsing):
    transcripts = read_ctm(io.StringIO(CTM))
    ours, theirs = io.StringIO(), io.StringIO()
    write_ctm(transcripts, ours, "A")
    ref_parsing.write_ctm(
        [(u, [tuple(s) for s in t]) for u, t in transcripts], theirs, "A"
    )
    assert ours.getvalue() == theirs.getvalue()


TG_LONG = """\
File type = "ooTextFile"
Object class = "TextGrid"

xmin = 0.1
xmax = 1
tiers? <exists>
size = 2
item []:
    item [1]:
       class = "IntervalTier"
       name = "a"
       xmin = 0.3
       xmax = 0.7
       intervals: size = 2
       intervals [1]:
          xmin = 0.3
          xmax = 0.4
          text = "paul"
       intervals [2]:
          xmin = 0.4
          xmax = 0.7
          text = "blart"
    item [2]:
       class = "TextTier"
       name = "b"
       xmin = 0.1
       xmax = 1
       points: size = 2
       points [1]:
          number = 0.3
          mark = "mall"
       points [2]:
          number = 0.9
          mark = "cop"
"""

TG_SHORT = """\
File type = "ooTextFile"
Object class = "TextGrid"
0
1
<exists>
1
"IntervalTier"
"pup"
0
1
3
0
0.1
"a"
0.1
0.2
"b"
0.2
1
"Z"
"""


@pytest.mark.parametrize("fmt", ["long", "short"])
def test_read_textgrid_matches_reference(ref_parsing, fmt):
    text = TG_LONG if fmt == "long" else TG_SHORT
    for tier_id in ([0, 1, "a", "b"] if fmt == "long" else [0, "pup"]):
        ours = read_textgrid(io.StringIO(text), tier_id)
        theirs = ref_parsing.read_textgrid(io.StringIO(text), tier_id)
        assert ours == theirs, tier_id
    # fill_token path
    ours = read_textgrid(io.StringIO(TG_LONG), "a", "fill")
    theirs = ref_parsing.read_textgrid(io.StringIO(TG_LONG), "a", "fill")
    assert ours == theirs


def test_write_textgrid_matches_reference(ref_parsing):
    transcript = [("cool", 0.1234, 0.1237), ("beans", 0.35, 0.4444)]
    ours, theirs = io.StringIO(), io.StringIO()
    write_textgrid(transcript, ours)
    ref_parsing.write_textgrid(transcript, theirs)
    assert ours.getvalue() == theirs.getvalue()
    # point tier inference
    pts = [("x", 0.5, 0.5), ("y", 0.75, 0.75)]
    ours2, theirs2 = io.StringIO(), io.StringIO()
    write_textgrid(pts, ours2)
    ref_parsing.write_textgrid(pts, theirs2)
    assert ours2.getvalue() == theirs2.getvalue()
    # and our reader handles our writer's output
    ours2.seek(0)
    back, _, _ = read_textgrid(ours2)
    assert back == pts


def test_transcript_token_conversion_matches_reference(ref_parsing):
    transcript = ["a", ("b", 0.1, 0.4), ("c", 0.4, 0.44), ("d", 0.5, 0.5)]
    token2id = {"a": 0, "b": 1, "c": 2}
    for shift in (None, 10.0, 25.0):
        ours = transcript_to_token(transcript, token2id, shift, unk="c")
        theirs = ref_parsing.transcript_to_token(
            transcript, token2id, shift, unk="c"
        )
        np.testing.assert_array_equal(ours, theirs.numpy())
    tok = transcript_to_token(transcript, token2id, 10.0, unk="c")
    id2token = {v: k for k, v in token2id.items()}
    import torch

    ours_t = token_to_transcript(tok, id2token, 10.0)
    theirs_t = ref_parsing.token_to_transcript(
        torch.as_tensor(tok), id2token, 10.0
    )
    assert ours_t == theirs_t


def test_parse_arpa_truncated_raises():
    """A file ending right after a section header must raise, not hang
    (the reference loops forever re-matching the stale header)."""
    import io

    from pydrobert_tpu.data import parse_arpa_lm

    text = "\\data\\\nngram 1=1\n\n\\1-grams:\n"
    with pytest.raises(IOError):
        parse_arpa_lm(io.StringIO(text), to_base_e=False)


def test_textgrid_multiline_quoted_text(tmp_path):
    """Quoted interval texts may span lines in Praat files."""
    from pydrobert_tpu.data import read_textgrid

    tg = (
        'File type = "ooTextFile"\n'
        'Object class = "TextGrid"\n'
        "xmin = 0\nxmax = 2\ntiers? <exists>\nsize = 1\nitem []:\n"
        "    item [1]:\n"
        '        class = "IntervalTier"\n'
        '        name = "words"\n'
        "        xmin = 0\n        xmax = 2\n"
        "        intervals: size = 1\n"
        "        intervals [1]:\n"
        "            xmin = 0\n            xmax = 2\n"
        '            text = "hello\nworld"\n'
    )
    pth = tmp_path / "x.TextGrid"
    pth.write_text(tg)
    transcript, xmin, xmax = read_textgrid(str(pth), "words")
    assert xmin == 0 and xmax == 2
    assert transcript[0][0] == "hello\nworld"
