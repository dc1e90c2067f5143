"""Golden end-to-end accuracy fixture (VERDICT round-1 #3).

A seeded tiny model + synthetic LongBench-format fixture + PINNED expected
outputs per method x budget, committed in tests/golden/expected.json.  A
score-level regression in any policy (selection membership, budget math,
quantization) changes the generated token streams and flips this test.

Pinned per config: the exact generated token ids for every example (maximal
sensitivity — any selection change alters tokens) AND the qa_f1 score that
the scoring pipeline computes from them (proves the jsonl -> metrics path).

The fixture uses only ``w<id>`` words: ToyTokenizer hashes other words with
process-salted ``hash()``, which would break cross-run determinism.

Regenerate after an INTENDED semantics change:
    GOLDEN_REGEN=1 python -m pytest tests/test_golden.py -q
then commit the diff with a note on why the semantics moved.

Weights-day runbook: scripts/reproduce_paper.sh turns real checkpoints into
the reference's LongBench/RULER/needle tables in one command.
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kvcache_factory_tpu.config import (CompressionConfig, EngineConfig,
                                        ModelConfig, QuantConfig)
from kvcache_factory_tpu.evals import metrics as M
from kvcache_factory_tpu.evals.longbench import (method_hyperparams,
                                                 run_dataset)
from kvcache_factory_tpu.models.weights import init_params
from kvcache_factory_tpu.runtime.engine import InferenceEngine

from toy_tokenizer import ToyTokenizer

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden",
                           "expected.json")
N_EXAMPLES = 4
BUDGETS = (24, 48)
# The FULL reference scoreboard (eval.py:99-110) plus merge/minference and
# the quantized cache (VERDICT round-2 #10 broadened round 1's 8 configs):
# (method, nbits, extra CompressionConfig kwargs / flags).
CONFIGS = [
    ("snapkv", None, {}),
    ("pyramidkv", None, {}),
    ("h2o", None, {}),
    ("streamingllm", None, {}),
    ("adakv", None, {}),
    ("think", None, {}),
    ("cam", None, {}),
    # skip_layers default (0, 1) would skip BOTH layers of the tiny model
    # (== fullkv, zero regression power); skip only layer 0 like the
    # reference does proportionally on deep models (pyramidkv_utils.py:961)
    ("l2norm", None, {"skip_layers": (0,)}),
    ("random", None, {}),
    # LOOK-M pivot merge of evicted KV on top of SnapKV selection
    ("snapkv", None, {"merge": "pivot"}),
    # HeadKV: per-head budgets from a synthetic retrieval-head score file
    # (reference data/heads_score schema, run_longbench.py:225-234)
    ("headkv", None, {"headkv": True}),
    # MInference: full KV retained; pins the method/config flow (the sparse
    # kernel itself is pinned by tests/test_flash_prefill.py)
    ("minference", None,
     {"sparse_prefill": ("vertical_slash", 64, 16, 16)}),
    ("snapkv", 4, {}),   # quantized-int4 cache under the flagship policy
    ("fullkv", None, {}),  # anchor: catches model-forward regressions alone
]


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(
        model_type="llama", vocab_size=128, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, max_position_embeddings=512,
        dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(42), dtype=jnp.float32)
    return cfg, params


def _fixture_examples():
    """Synthetic hotpotqa-format examples from only w<id> words."""
    rng = np.random.default_rng(2024)
    examples = []
    for i in range(N_EXAMPLES):
        words = [f"w{int(t)}" for t in rng.integers(2, 128, size=100)]
        answer = f"w{int(rng.integers(2, 128))}"
        words[30 + 7 * i] = answer  # plant the answer mid-context
        examples.append({
            "context": " ".join(words),
            "input": f"w{int(rng.integers(2, 128))} w{int(rng.integers(2, 128))}",
            "answers": [answer],
            "all_classes": None,
            "length": 100,
            "_id": f"golden-{i}",
        })
    return examples


def _synth_head_capacity(cfg, budget, tmp_path):
    """Deterministic synthetic head scores in the reference schema
    ("layer-head" -> [floats]) -> per-head capacities via the reference
    pool formula (run_longbench.py:225-234)."""
    from kvcache_factory_tpu.evals.longbench import headkv_capacities
    rng = np.random.default_rng(7)
    scores = {f"{l}-{h}": [float(rng.random())]
              for l in range(cfg.num_hidden_layers)
              for h in range(cfg.num_attention_heads)}
    p = tmp_path / "heads.json"
    with open(p, "w") as f:
        json.dump(scores, f)
    return headkv_capacities(str(p), cfg.num_hidden_layers,
                             cfg.num_attention_heads, budget, 1.01)


def _run_config(cfg, params, method, nbits, budget, tmp_path, extra=None):
    extra = dict(extra or {})
    head_capacity = (_synth_head_capacity(cfg, budget, tmp_path)
                     if extra.pop("headkv", False) else None)
    tag_suffix = "-pivot" if extra.get("merge") == "pivot" else ""
    hp = method_hyperparams(method, budget)
    comp = CompressionConfig(
        method=method, max_capacity_prompt=budget,
        window_size=hp.get("window_size", 8),
        kernel_size=hp.get("kernel_size", 7),
        pooling=hp.get("pooling", "maxpool"), **extra)
    quant = QuantConfig(nbits=nbits, q_group_size=16) if nbits else None
    engine = InferenceEngine(
        params, EngineConfig(model=cfg, compression=comp, quant=quant,
                             prefill_buckets=(256,)),
        head_capacity=head_capacity,
        rng=jax.random.PRNGKey(42))
    tok = ToyTokenizer()

    data_file = tmp_path / "hotpotqa.jsonl"
    if not data_file.exists():
        with open(data_file, "w") as f:
            for ex in _fixture_examples():
                f.write(json.dumps(ex) + "\n")

    tag = f"{method}{tag_suffix}{'-int' + str(nbits) if nbits else ''}_{budget}"
    out_path = tmp_path / "out" / tag / "hotpotqa" / f"{method}.json"
    run_dataset(engine, tok, "hotpotqa", str(data_file), str(out_path),
                model_max=250, progress=False)
    recs = [json.loads(l) for l in open(out_path)]
    preds = [tok.encode(r["pred"]) for r in recs]
    score = round(100 * float(np.mean([
        M.qa_f1_score(r["pred"], r["answers"][0]) for r in recs])), 4)
    return tag, {"preds": preds, "score": score}


def test_golden_scoreboard(setup, tmp_path):
    cfg, params = setup
    got = {}
    for budget in BUDGETS:
        for method, nbits, extra in CONFIGS:
            tag, res = _run_config(cfg, params, method, nbits, budget,
                                   tmp_path, extra)
            got[tag] = res

    if os.environ.get("GOLDEN_REGEN") == "1":
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        with open(GOLDEN_PATH, "w") as f:
            json.dump(got, f, indent=1, sort_keys=True)
        pytest.skip("regenerated golden fixture")

    assert os.path.exists(GOLDEN_PATH), \
        "golden fixture missing; run GOLDEN_REGEN=1 pytest tests/test_golden.py"
    expected = json.load(open(GOLDEN_PATH))
    assert set(got) == set(expected), (set(got) ^ set(expected))
    for tag in sorted(expected):
        assert got[tag]["preds"] == expected[tag]["preds"], (
            f"{tag}: generated tokens diverged from golden fixture — a "
            "policy/model semantics change; if intended, regenerate with "
            "GOLDEN_REGEN=1 and document why")
        assert got[tag]["score"] == expected[tag]["score"], tag


def test_golden_distinguishes_methods(setup, tmp_path):
    """Sanity: the fixture actually separates policies (identical token
    streams for different methods would mean zero regression power)."""
    cfg, params = setup
    tag_a, a = _run_config(cfg, params, "snapkv", None, 24, tmp_path)
    tag_b, b = _run_config(cfg, params, "streamingllm", None, 24, tmp_path)
    tag_c, c = _run_config(cfg, params, "fullkv", None, 24, tmp_path)
    assert a["preds"] != b["preds"]
    assert a["preds"] != c["preds"]
