"""GPT-2 byte-level BPE (utils/bpe.py) — parity vs transformers'
GPT2Tokenizer on a synthetic vocab, plus decode semantics."""

import json

import pytest

from trajectorycrafter_tpu.utils.bpe import GPT2BPETokenizer, bytes_to_unicode

MERGES = [("h", "e"), ("l", "l"), ("ll", "o"), ("Ġ", "w"), ("o", "r"),
          ("Ġw", "or"), ("1", "2")]


def _vocab():
    toks = list(bytes_to_unicode().values())
    toks += ["he", "ll", "llo", "Ġw", "or", "Ġwor", "12",
             "<|endoftext|>", "</s>"]
    return {t: i for i, t in enumerate(toks)}


@pytest.fixture()
def tok():
    return GPT2BPETokenizer(_vocab(), MERGES,
                            special_tokens={"</s>": _vocab()["</s>"]})


def test_encode_applies_merges(tok):
    v = _vocab()
    assert tok.encode("hello") == [v["he"], v["llo"]]
    assert tok.encode("hello world") == [v["he"], v["llo"], v["Ġwor"],
                                         v["l"], v["d"]]
    assert tok.encode("a 123") == [v["a"], v["Ġ"], v["12"], v["3"]]


def test_decode_roundtrip_and_specials(tok):
    v = _vocab()
    for text in ("hello world", "héllo", "  spaced  out "):
        assert tok.decode(tok.encode(text)) == text
    ids = [v["</s>"]] + tok.encode("hello") + [v["</s>"]]
    assert tok.decode(ids) == "hello"
    assert tok.decode(ids, skip_special_tokens=False) == "</s>hello</s>"


def test_parity_vs_transformers(tmp_path, tok):
    transformers = pytest.importorskip("transformers")

    vocab_file = tmp_path / "vocab.json"
    merges_file = tmp_path / "merges.txt"
    vocab_file.write_text(json.dumps(_vocab()))
    # trailing newline matters: transformers' loader drops the last line
    merges_file.write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in MERGES) + "\n")
    hf = transformers.GPT2Tokenizer(str(vocab_file), str(merges_file),
                                    unk_token="<|endoftext|>")
    for text in ("hello world", "a 123 or llo", "héllo world",
                 "why, hello...", "snake_case or_ _12", "a__b", "_"):
        assert tok.encode(text) == hf.encode(text), text
        assert tok.decode(tok.encode(text)) == hf.decode(hf.encode(text))


def test_from_dir(tmp_path):
    (tmp_path / "vocab.json").write_text(json.dumps(_vocab()))
    (tmp_path / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in MERGES))
    (tmp_path / "special_tokens_map.json").write_text(
        json.dumps({"bos_token": "</s>", "eos_token": {"content": "</s>"}}))
    tok = GPT2BPETokenizer.from_dir(str(tmp_path))
    assert tok.decode(tok.encode("hello world")) == "hello world"
    assert tok.special == {"</s>": _vocab()["</s>"]}
