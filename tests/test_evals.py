"""Eval-harness tests: metrics parity with the reference formulas, and the
LongBench/RULER/needle runners end-to-end on a tiny model + toy tokenizer."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kvcache_factory_tpu.config import (CompressionConfig, EngineConfig,
                                        GenerationConfig, ModelConfig)
from kvcache_factory_tpu.evals import metrics as M
from kvcache_factory_tpu.evals import score as S
from kvcache_factory_tpu.evals.longbench import (headkv_capacities,
                                                 method_hyperparams,
                                                 middle_truncate, run_dataset)
from kvcache_factory_tpu.models.weights import init_params
from kvcache_factory_tpu.runtime.engine import InferenceEngine

from toy_tokenizer import ToyTokenizer


# ---------------------------------------------------------------------------
# Metrics
# ---------------------------------------------------------------------------

def test_qa_f1():
    assert M.qa_f1_score("The answer is Paris", "paris") == pytest.approx(2 * (1/3) / (1/3 + 1))
    assert M.qa_f1_score("the", "banana") == 0.0
    # articles removed
    assert M.qa_f1_score("a banana", "banana") == 1.0


def test_count_and_retrieval():
    assert M.count_score("there are 7 paragraphs, yes 7", "7") == 1.0
    assert M.count_score("maybe 3 or 7", "7") == 0.5
    assert M.count_score("none", "7") == 0.0
    assert M.retrieval_score("Paragraph 12", "Paragraph 12") == 1.0
    assert M.retrieval_score("paragraphs 3 and 12", "Paragraph 12") == 0.5


def test_classification():
    assert M.classification_score("it is about sports", "sports",
                                  all_classes=["sports", "politics"]) == 1.0
    # two matches -> 1/2 credit
    assert M.classification_score("sports politics", "sports",
                                  all_classes=["sports", "politics"]) == 0.5
    # substring-of-ground-truth match removed (reference :95-97)
    assert M.classification_score("about sport", "sports news",
                                  all_classes=["sport", "sports news"]) == 0.0


def test_code_sim():
    assert M.code_sim_score("return x + 1", "return x + 1") == 1.0
    assert M.code_sim_score("# comment\nreturn x", "return x") == 1.0


def test_string_match_all():
    assert M.string_match_all(["foo BAR baz"], [["bar", "foo"]]) == 100.0
    assert M.string_match_all(["foo"], [["bar", "foo"]]) == 50.0
    assert M.string_match_all(["a", "b"], [["a"], ["z"]]) == 50.0


def test_rouge():
    assert M.rouge_score("the cat sat", "the cat sat") == pytest.approx(1.0, abs=1e-6)
    assert M.rouge_score("", "x") == 0.0


def test_scorer_first_line_trim():
    score = S.scorer("trec", ["sports\ngarbage"], [["sports"]],
                     ["sports", "politics"])
    assert score == 100.0


# ---------------------------------------------------------------------------
# Runner plumbing
# ---------------------------------------------------------------------------

def test_method_hyperparams_table():
    assert method_hyperparams("snapkv", 128) == {
        "window_size": 8, "kernel_size": 7, "pooling": "maxpool"}
    assert method_hyperparams("streamingllm", 128)["window_size"] == 124
    assert method_hyperparams("fullkv", 128) == {}


def test_middle_truncate():
    tok = ToyTokenizer()
    ids = list(range(2, 102))
    out = middle_truncate(ids, 10, tok)
    # decode+concat+re-encode can merge the boundary pair (reference behavior)
    assert 9 <= len(out) <= 10
    assert out[:4] == ids[:4] and out[-4:] == ids[-4:]
    assert middle_truncate(ids, 200, tok) == ids


def test_headkv_capacities(tmp_path):
    L, H = 2, 2
    scores = {f"{l}-{h}": [1.0 + l + h] for l in range(L) for h in range(H)}
    p = tmp_path / "heads.json"
    p.write_text(json.dumps(scores) + "\n")
    caps = headkv_capacities(str(p), L, H, 128, 1.01)
    assert caps.shape == (L, H)
    assert caps.dtype == np.int32
    assert (caps > 0).all()
    # Higher-scored heads get more capacity.
    assert caps[1, 1] >= caps[0, 0]


@pytest.fixture(scope="module")
def tiny_engine():
    cfg = ModelConfig(
        model_type="llama", vocab_size=128, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, max_position_embeddings=512,
        dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    comp = CompressionConfig(method="snapkv", max_capacity_prompt=32,
                             window_size=8, kernel_size=7, pooling="maxpool")
    ecfg = EngineConfig(model=cfg, compression=comp,
                        prefill_buckets=(64, 128, 256))
    return InferenceEngine(params, ecfg)


def _write_longbench_fixture(path, n=2):
    rows = []
    for i in range(n):
        rows.append({
            "input": f"what is item {i}?",
            "context": " ".join(f"word{j}" for j in range(200)),
            "answers": [f"answer{i}"], "length": 200, "dataset": "qasper",
            "language": "en", "all_classes": None, "_id": f"id{i}",
        })
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_longbench_runner_end_to_end(tiny_engine, tmp_path):
    tok = ToyTokenizer()
    data_file = tmp_path / "qasper.jsonl"
    _write_longbench_fixture(data_file)
    out_path = tmp_path / "out" / "qasper" / "SnapKV.json"
    n = run_dataset(tiny_engine, tok, "qasper", str(data_file), str(out_path),
                    model_max=250, progress=False)
    assert n == 2
    recs = [json.loads(l) for l in open(out_path)]
    assert len(recs) == 2
    for r in recs:
        assert isinstance(r["pred"], str) and r["answers"] == [f"answer{recs.index(r)}"]
        assert r["dataset"] == "qasper"


def test_ruler_runner_end_to_end(tiny_engine, tmp_path):
    from kvcache_factory_tpu.evals.ruler import run_task
    tok = ToyTokenizer()
    data_file = tmp_path / "niah_single_1.jsonl"
    with open(data_file, "w") as f:
        f.write(json.dumps({"index": 0,
                            "input": " ".join(f"t{i}" for i in range(150)),
                            "outputs": ["magic"], "length": 150}) + "\n")
    out_path = tmp_path / "ruler" / "niah_single_1" / "FullKV.json"
    n = run_task(tiny_engine, tok, "niah_single_1", str(data_file),
                 str(out_path), model_max=250, progress=False)
    assert n == 1
    rec = json.loads(open(out_path).readline())
    assert rec["answers"] == ["magic"]


def test_score_results_dir(tmp_path):
    # Build a fake results tree for two methods, one dataset.
    d = tmp_path / "qasper"
    d.mkdir()
    for method, pred in [("FullKV", "answer0"), ("SnapKV", "wrong")]:
        with open(d / f"{method}.json", "w") as f:
            f.write(json.dumps({"pred": pred, "answers": ["answer0"],
                                "all_classes": None, "length": 100}) + "\n")
    rows = S.score_results_dir(str(tmp_path), "longbench")
    header = rows[0]
    assert header[:2] == ["dataset", "narrativeqa"]
    fullkv_row = rows[1]
    idx = header.index("qasper")
    assert fullkv_row[0] == "FullKV"
    assert fullkv_row[idx] == 100.0
    snapkv_row = rows[3]
    assert snapkv_row[0] == "SnapKV"
    assert snapkv_row[idx] == 0.0
    # Missing datasets record -1 (reference eval.py:175-179).
    assert rows[1][1] == -1
    assert os.path.exists(tmp_path / "results.csv")
    assert os.path.exists(d / "metrics.json")


def test_needle_tester_end_to_end(tiny_engine, tmp_path):
    from kvcache_factory_tpu.evals.needle import NeedleHaystackTester
    hay = tmp_path / "essays"
    hay.mkdir()
    (hay / "essay1.txt").write_text("word " * 2000 + ". ")
    tok = ToyTokenizer()
    tester = NeedleHaystackTester(
        tiny_engine, tok, str(hay), str(tmp_path / "results"),
        context_lengths=[230], depth_percents=[0, 50, 100],
        model_version="tiny", print_status=False)
    results = tester.run()
    assert len(results) == 3
    for r in results:
        assert 0.0 <= r["score"] <= 10.0
        assert r["context_length"] == 230
    # Resume: second run skips all cells.
    assert tester.run() == []


def test_needle_viz_scores(tmp_path):
    from kvcache_factory_tpu.evals.needle_viz import load_scores, overall_score
    d = tmp_path / "res"
    d.mkdir()
    (d / "a.json").write_text(json.dumps({
        "depth_percent": 50, "context_length": 1000,
        "model_response": "eat a sandwich and sit in dolores park on a sunny day.",
        "needle": "x"}))
    rows = load_scores(str(d))
    assert rows[0]["Score"] == 1.0
    assert overall_score(str(d)) == 1.0


REFERENCE_DATA = "/root/reference/data"


@pytest.mark.skipif(not os.path.isdir(REFERENCE_DATA),
                    reason="reference data not mounted")
def test_longbench_runner_on_real_reference_data(tiny_engine, tmp_path):
    """End-to-end on the actual bundled LongBench jsonl (multi_news)."""
    tok = ToyTokenizer()
    out_path = tmp_path / "out" / "multi_news" / "SnapKV.json"
    n = run_dataset(tiny_engine, tok, "multi_news",
                    os.path.join(REFERENCE_DATA, "LongBench/multi_news.jsonl"),
                    str(out_path), model_max=200, max_num_examples=2,
                    progress=False)
    assert n == 2
    recs = [json.loads(l) for l in open(out_path)]
    assert all(isinstance(r["pred"], str) for r in recs)
    assert all(r["answers"] for r in recs)


@pytest.mark.skipif(not os.path.isdir(REFERENCE_DATA),
                    reason="reference data not mounted")
def test_ruler_runner_on_real_reference_data(tiny_engine, tmp_path):
    from kvcache_factory_tpu.evals.ruler import run_task
    import glob
    files = glob.glob(os.path.join(REFERENCE_DATA, "RULER/4096/*.jsonl"))
    assert files
    task = os.path.splitext(os.path.basename(files[0]))[0]
    tok = ToyTokenizer()
    out_path = tmp_path / "ruler" / task / "FullKV.json"
    n = run_task(tiny_engine, tok, task, files[0], str(out_path),
                 model_max=200, max_num_examples=1, progress=False)
    assert n == 1


@pytest.mark.skipif(not os.path.isdir(REFERENCE_DATA),
                    reason="reference data not mounted")
def test_needle_on_real_essays(tiny_engine, tmp_path):
    from kvcache_factory_tpu.evals.needle import NeedleHaystackTester
    tester = NeedleHaystackTester(
        tiny_engine, ToyTokenizer(),
        os.path.join(REFERENCE_DATA, "PaulGrahamEssays"),
        str(tmp_path / "results"), context_lengths=[150],
        depth_percents=[50], model_version="tiny-real",
        print_status=False)
    results = tester.run()
    assert len(results) == 1 and 0 <= results[0]["score"] <= 10
