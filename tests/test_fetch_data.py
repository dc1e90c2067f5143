"""tools/fetch_data.py offline generators: schema parity with the reference
data assets (SURVEY.md §1) and consumability by the eval harnesses."""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import fetch_data  # noqa: E402

from kvcache_factory_tpu.evals.longbench import headkv_capacities  # noqa: E402
from kvcache_factory_tpu.evals.metrics import string_match_all  # noqa: E402


def test_heads_schema_consumable(tmp_path, monkeypatch):
    monkeypatch.setattr(fetch_data, "DATA", str(tmp_path))
    path = fetch_data.gen_heads(num_layers=4, num_heads=8, seed=3,
                                model_name="tiny")
    # Reference schema: ONE json line, "layer-head" -> list of floats
    # (run_longbench.py:225-234 reads with json.loads(f.readline())).
    with open(path) as f:
        first = f.readline()
        rest = f.read()
    d = json.loads(first)
    assert rest.strip() == ""
    assert set(d) == {f"{l}-{h}" for l in range(4) for h in range(8)}
    assert all(isinstance(v, list) and all(isinstance(x, float) for x in v)
               for v in d.values())

    caps = headkv_capacities(path, 4, 8, max_capacity=128, head_beta=1.01)
    assert caps.shape == (4, 8)
    assert caps.dtype == np.int32
    assert (caps >= 1).all()
    # adaptive: strong heads get more than weak heads
    assert caps.max() > caps.min()


def test_heads_deterministic(tmp_path, monkeypatch):
    monkeypatch.setattr(fetch_data, "DATA", str(tmp_path))
    p1 = fetch_data.gen_heads(num_layers=2, num_heads=4, model_name="a")
    c1 = open(p1).read()
    os.remove(p1)
    p2 = fetch_data.gen_heads(num_layers=2, num_heads=4, model_name="a")
    assert open(p2).read() == c1


def test_ruler_generator_layout_and_scoring(tmp_path, monkeypatch):
    monkeypatch.setattr(fetch_data, "DATA", str(tmp_path))
    fetch_data.gen_ruler(context_lengths=(512,), n_examples=3)
    task_dir = tmp_path / "RULER" / "512"
    files = sorted(os.listdir(task_dir))
    assert "niah_single_1.jsonl" in files and "cwe.jsonl" in files
    for fn in files:
        recs = [json.loads(l) for l in open(task_dir / fn)]
        assert len(recs) == 3
        for r in recs:
            assert set(r) == {"index", "input", "outputs", "length"}
            assert isinstance(r["outputs"], list) and r["outputs"]
            # a perfect prediction scores 100 under the RULER metric
            perfect = " ".join(r["outputs"])
            assert string_match_all([perfect], [r["outputs"]]) == 100.0
            # the needle value actually appears in the context
            if fn.startswith("niah"):
                assert r["outputs"][0] in r["input"]
