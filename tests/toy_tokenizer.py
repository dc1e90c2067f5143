"""Minimal word-level tokenizer implementing the interface the runners use
(encode/decode/eos_token_id), so eval harnesses are testable without HF
tokenizer files (none are downloadable in this environment)."""

import zlib


class ToyTokenizer:
    def __init__(self, vocab_size=128, eos_token_id=1):
        self.vocab_size = vocab_size
        self.eos_token_id = eos_token_id

    def encode(self, text, add_special_tokens=True):
        # Round-trip stable: "w<id>" decodes back to <id>; other words hash
        # deterministically into [2, vocab). ids 0/1 reserved.  crc32, not
        # hash(): Python's str hash is salted per process, which would make
        # golden fixtures (tests/test_golden.py) irreproducible across runs.
        out = []
        for w in text.split():
            if w.startswith("w") and w[1:].isdigit() and int(w[1:]) < self.vocab_size:
                out.append(int(w[1:]))
            else:
                out.append(2 + (zlib.crc32(w.encode()) % (self.vocab_size - 2)))
        return out

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(f"w{i}" for i in ids
                        if not (skip_special_tokens and i < 2))
