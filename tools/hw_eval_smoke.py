"""Real-TPU end-to-end USER WORKFLOW smoke: LongBench runner -> predictions
-> scoring, with the Pallas decode path engaged (head_dim 128).

Mirrors tests/test_evals.py::test_longbench_runner_end_to_end but on the
actual chip via the public engine + runner + scorer APIs — proving the full
CLI workflow (the reference's run_longbench.py -> eval.py pipeline,
SURVEY.md §3.1) compiles and runs on hardware, not just the CPU test mesh.

Run on a TPU host: python tools/hw_eval_smoke.py  (~2 min)
"""
import json, os, sys, tempfile
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tests"))
import jax, jax.numpy as jnp

from kvcache_factory_tpu.config import (CompressionConfig, EngineConfig,
                                        ModelConfig)
from kvcache_factory_tpu.evals import score as S
from kvcache_factory_tpu.evals.longbench import run_dataset
from kvcache_factory_tpu.models.weights import init_params
from kvcache_factory_tpu.runtime.engine import InferenceEngine
from toy_tokenizer import ToyTokenizer

cfg = ModelConfig(model_type="llama", vocab_size=128, hidden_size=256,
                  intermediate_size=512, num_hidden_layers=2,
                  num_attention_heads=2, num_key_value_heads=1, head_dim=128,
                  max_position_embeddings=512)
params = init_params(cfg, jax.random.PRNGKey(0))
comp = CompressionConfig(method="snapkv", max_capacity_prompt=32,
                         window_size=8, kernel_size=7, pooling="maxpool")
eng = InferenceEngine(params, EngineConfig(model=cfg, compression=comp,
                                           prefill_buckets=(64, 128, 256)))
tok = ToyTokenizer()

with tempfile.TemporaryDirectory() as td:
    data = os.path.join(td, "qasper.jsonl")
    with open(data, "w") as f:
        for i in range(2):
            f.write(json.dumps({
                "input": f"question {i}?",
                "context": " ".join(f"w{j}" for j in range(120)),
                "answers": [f"answer{i}"], "all_classes": None,
                "length": 120, "dataset": "qasper",
                "language": "en", "_id": str(i)}) + "\n")
    out = os.path.join(td, "results", "qasper", "SnapKV.json")
    n = run_dataset(eng, tok, "qasper", data, out, model_max=250,
                    progress=False)
    assert n == 2, n
    recs = [json.loads(l) for l in open(out)]
    assert all(isinstance(r["pred"], str) for r in recs)
    rows = S.score_results_dir(os.path.join(td, "results"), "longbench")
    print("predictions:", [r["pred"][:20] for r in recs])
    print("score rows:", rows)
print("hw eval workflow OK (backend:", jax.default_backend() + ")")
