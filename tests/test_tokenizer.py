"""CLIP byte-level BPE tokenizer (salun/sd/tokenizer.py).

Parity target: the HF CLIPTokenizer used by FrozenCLIPEmbedder
(SD/ldm/modules/encoders/modules.py:230-266). Mechanics are tested on a
synthetic merge table; real-vocab id fixtures run only when real assets
are present (zero-egress containers skip them)."""

import numpy as np
import pytest

from salun.sd.tokenizer import (
    CLIPBPETokenizer, _TOKEN_PAT, bytes_to_unicode, load_clip_tokenizer,
)

pytestmark = pytest.mark.quick

MERGES = [("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o</w>"),
          ("t", "h"), ("th", "e</w>")]


@pytest.fixture
def tok():
    return CLIPBPETokenizer(MERGES)


def test_bytes_to_unicode_bijective():
    m = bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256


def test_vocab_construction(tok):
    # 256 byte symbols + 256 </w> variants + merges + 2 specials
    assert len(tok.encoder) == 512 + len(MERGES) + 2
    assert tok.encoder["<|startoftext|>"] == tok.bos_id
    assert tok.encoder["<|endoftext|>"] == tok.eos_id
    assert tok.eos_id == tok.bos_id + 1


def test_merge_order(tok):
    # "hello" merges all the way down the handcrafted chain
    assert tok.bpe("hello") == "hello</w>"
    # "the" uses (t,h) then (th,e</w>)
    assert tok.bpe("the") == "the</w>"
    # unknown word stays at byte level apart from applicable merges
    assert tok.bpe("ox") == "o x</w>"


def test_end_of_word_distinct_ids(tok):
    # "o" mid-word vs word-final map to different symbols
    ids_hello = tok.encode("hello")
    assert ids_hello == [tok.encoder["hello</w>"]]
    ids_ox = tok.encode("ox")
    assert ids_ox == [tok.encoder["o"], tok.encoder["x</w>"]]


def test_lowercase_and_whitespace_clean(tok):
    assert tok.encode("HeLLo") == tok.encode("hello")
    assert tok.encode("  hello\t\nthe ") == tok.encode("hello the")


def test_regex_contractions():
    assert _TOKEN_PAT.findall("isn't") == ["isn", "'t"]
    assert _TOKEN_PAT.findall("we're 2 dogs!!") == ["we", "'re", "2",
                                                    "dogs", "!!"]
    # underscore falls into the punctuation class (CLIP semantics)
    assert _TOKEN_PAT.findall("a_b") == ["a", "_", "b"]


def test_batch_padding_truncation(tok):
    out = tok(["hello", "the hello the"], max_length=5)
    assert out.shape == (2, 5) and out.dtype == np.int32
    assert (out[:, 0] == tok.bos_id).all()
    # row 0: hello + eos + eos-pad
    assert out[0, 1] == tok.encoder["hello</w>"]
    assert (out[0, 2:] == tok.eos_id).all()
    # row 1 truncates to 3 content tokens + eos
    assert out[1, -1] == tok.eos_id


def test_unicode_bytes_roundtrip(tok):
    # non-ASCII text byte-encodes without KeyError and stays in-vocab
    ids = tok.encode("café 猫")
    assert all(0 <= i < len(tok.encoder) for i in ids)


def test_loader_uses_env_synthetic(monkeypatch):
    # conftest points SALUN_CLIP_BPE at the synthetic merges file
    t = load_clip_tokenizer()
    out = t(["hello"], 7)
    assert out.shape == (1, 7)


def test_loader_fails_loudly(monkeypatch, tmp_path):
    monkeypatch.delenv("SALUN_CLIP_BPE", raising=False)
    monkeypatch.setattr(
        "salun.sd.tokenizer.os.path.exists", lambda p: False)
    monkeypatch.setattr(
        "salun.sd.tokenizer.os.path.isdir", lambda p: False)
    with pytest.raises(FileNotFoundError):
        load_clip_tokenizer()


def test_real_clip_ids_if_assets_present():
    """Hard-coded id fixture for the REAL vocab ('a photo of a cat' =
    [49406, 320, 1125, 539, 320, 2368, 49407, ...]); runs only where real
    CLIP assets exist."""
    import os

    env = os.environ.get("SALUN_CLIP_BPE", "")
    if "_synthetic_clip_merges" in env:
        pytest.skip("no real CLIP BPE assets in this environment")
    t = load_clip_tokenizer()
    out = t(["a photo of a cat"], 77)
    np.testing.assert_array_equal(
        out[0, :7], [49406, 320, 1125, 539, 320, 2368, 49407])
    assert (out[0, 7:] == 49407).all()
