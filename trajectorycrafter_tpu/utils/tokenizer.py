"""Offline T5 tokenizer: spiece.model -> a `tokenizers` Unigram pipeline.

The reference tokenizes prompts with the HF T5 tokenizer
(pipeline_trajectorycrafter.py:248-296, loaded at demo.py:643-657); the slow
path needs the `sentencepiece` wheel, which this image does not ship.  This
module rebuilds the exact fast-tokenizer pipeline instead: it parses the
sentencepiece ModelProto with protobuf and assembles the same
normalizer/pre-tokenizer/Unigram/post-processor stack that transformers'
T5Converter produces (convert_slow_tokenizer.py, mirrored here), so ids
match HF's T5TokenizerFast bit-for-bit -- fully offline, no sentencepiece.
"""

from __future__ import annotations

import os
from typing import List, Sequence, Union

import numpy as np

T5_EXTRA_IDS = 100
T5_MAX_LENGTH = 226  # reference pipeline_trajectorycrafter.py:248 max_sequence_length


def _tokenizer_from_spiece(spiece_path: str):
    from tokenizers import AddedToken, Regex, Tokenizer, normalizers, pre_tokenizers
    from tokenizers.models import Unigram
    from tokenizers.processors import TemplateProcessing
    from transformers.utils import sentencepiece_model_pb2_new as model_pb2

    proto = model_pb2.ModelProto()
    with open(spiece_path, "rb") as f:
        proto.ParseFromString(f.read())
    if proto.trainer_spec.model_type != 1:
        raise ValueError(
            f"{spiece_path}: not a Unigram sentencepiece model "
            f"(model_type={proto.trainer_spec.model_type})"
        )

    vocab = [(p.piece, p.score) for p in proto.pieces]
    # T5 appends <extra_id_99>..<extra_id_0> sentinels after the spm vocab
    vocab += [(f"<extra_id_{i}>", 0.0) for i in range(T5_EXTRA_IDS - 1, -1, -1)]
    tok = Tokenizer(Unigram(vocab, unk_id=proto.trainer_spec.unk_id,
                            byte_fallback=False))

    # control (type 3) / user-defined (type 4) symbols become added tokens
    added = [(i, p.piece, p.type == 3)
             for i, p in enumerate(proto.pieces) if p.type in (3, 4)]
    tok.add_tokens([
        AddedToken(piece, normalized=False, special=special)
        for _, piece, special in sorted(added, key=lambda x: x[0])
    ])
    tok.add_tokens([
        AddedToken(f"<extra_id_{i}>", normalized=False, special=True)
        for i in range(T5_EXTRA_IDS - 1, -1, -1)
    ])

    norms = [
        normalizers.Strip(left=False, right=True),
        normalizers.Replace(Regex(" {2,}"), "▁"),
    ]
    charsmap = proto.normalizer_spec.precompiled_charsmap
    if charsmap:
        norms = [normalizers.Precompiled(charsmap)] + norms
    tok.normalizer = normalizers.Sequence(norms)
    tok.pre_tokenizer = pre_tokenizers.Metaspace(replacement="▁",
                                                 prepend_scheme="always")

    eos_id = next((i for i, p in enumerate(proto.pieces) if p.piece == "</s>"), 1)
    tok.post_processor = TemplateProcessing(
        single=["$A", "</s>"], pair=["$A", "</s>", "$B", "</s>"],
        special_tokens=[("</s>", eos_id)],
    )
    return tok


class T5Tokenizer:
    """Minimal HF-compatible callable: text(s) -> padded int32 id matrix."""

    def __init__(self, path: str):
        from tokenizers import Tokenizer

        if os.path.isdir(path):
            json_path = os.path.join(path, "tokenizer.json")
            spiece_path = os.path.join(path, "spiece.model")
            if os.path.isfile(json_path):
                self._tok = Tokenizer.from_file(json_path)
            elif os.path.isfile(spiece_path):
                self._tok = _tokenizer_from_spiece(spiece_path)
            else:
                raise FileNotFoundError(
                    f"no tokenizer.json or spiece.model under {path} -- "
                    "download the CogVideoX-Fun tokenizer/ folder "
                    "(reference download/download_hf.py fetches it with the "
                    "text encoder)"
                )
        elif path.endswith(".json"):
            self._tok = Tokenizer.from_file(path)
        else:
            self._tok = _tokenizer_from_spiece(path)
        self.pad_id = self._tok.token_to_id("<pad>") or 0
        self.eos_id = self._tok.token_to_id("</s>")

    def __call__(self, text: Union[str, Sequence[str]],
                 max_length: int = T5_MAX_LENGTH) -> np.ndarray:
        texts: List[str] = [text] if isinstance(text, str) else list(text)
        self._tok.enable_truncation(max_length)
        self._tok.enable_padding(length=max_length, pad_id=self.pad_id,
                                 pad_token="<pad>")
        encs = self._tok.encode_batch(texts)
        return np.asarray([e.ids for e in encs], np.int32)

    def decode(self, ids: Sequence[int]) -> str:
        return self._tok.decode(list(int(i) for i in ids))
