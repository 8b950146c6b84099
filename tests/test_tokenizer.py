"""Tokenizer parity vs HuggingFace's CLIPTokenizer (independent oracle).

We materialize vocab.json/merges.txt from the same BPE data file and let
transformers' slow CLIPTokenizer encode the same strings.
"""

import gzip
import json
import os

import numpy as np
import pytest

from catseg_tpu.text import ClipBPE, tokenize
from catseg_tpu.text.tokenizer import find_bpe_vocab, N_MERGES

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def hf_tokenizer(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("clip_vocab")
    bpe = ClipBPE()
    vocab_file = tmp / "vocab.json"
    merges_file = tmp / "merges.txt"
    vocab_file.write_text(json.dumps(bpe.token_to_id, ensure_ascii=False))
    lines = gzip.open(find_bpe_vocab()).read().decode("utf-8").split("\n")
    merges_file.write_text("#version: 0.2\n" + "\n".join(lines[1 : N_MERGES + 1]))
    return transformers.CLIPTokenizer(str(vocab_file), str(merges_file))


STRINGS = [
    "A photo of a cat in the scene",
    "a bad photo of the aeroplane.",
    "wall-brick",
    "stuffed animal, plushie",
    "a satallite image of baseball field",
    "person",
    "water, sea, lake, river",
    "an embroidered 42!",
]


@pytest.mark.parametrize("text", STRINGS)
def test_encode_matches_hf(hf_tokenizer, text):
    ours = ClipBPE().encode(text)
    theirs = hf_tokenizer(text.lower())["input_ids"][1:-1]  # strip bos/eos
    assert ours == theirs, (text, ours, theirs)


def test_tokenize_framing():
    toks = tokenize(["a photo of a dog"])
    assert toks.shape == (1, 77)
    bpe = ClipBPE()
    assert toks[0, 0] == bpe.sot
    eot_pos = int(np.argmax(toks[0]))  # eot is the max id in the row
    assert toks[0, eot_pos] == bpe.eot
    assert (toks[0, eot_pos + 1 :] == 0).all()


def test_tokenize_too_long_raises():
    with pytest.raises(RuntimeError):
        tokenize(["word " * 100])


def test_known_token_ids():
    # "a photo of a ... ." uses well-known CLIP vocabulary ids
    bpe = ClipBPE()
    assert bpe.sot == 49406 and bpe.eot == 49407
    assert bpe.encode("a") == [320]
    assert bpe.encode("a photo of a cat.") == [320, 1125, 539, 320, 2368, 269]


def test_ascii_fallback_pattern_matches_regex_module():
    """The plain-re fallback must tokenize underscores as punctuation like
    CLIP's \\p{L}/\\p{N} pattern does (underscore is in \\w but not \\p{L})."""
    import re

    import regex

    real = regex.compile(
        r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
        regex.IGNORECASE)
    fall = re.compile(
        r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[^\W\d_]+|\d|(?:[^\s\w]|_)+""",
        re.IGNORECASE)
    for s in ["mobile_home", "a_b-c", "__x__", "hello, world's 42nd thing!",
              "a.b_c-d", "_", "_-_", "snake_case_name 3_4"]:
        assert real.findall(s) == fall.findall(s), s
