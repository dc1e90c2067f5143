"""Data acquisition for the eval harnesses (VERDICT round-1 #7).

The reference ships its fixtures in-repo (data/LongBench/*.jsonl,
data/PaulGrahamEssays/*.txt used at run_needle_in_haystack.py:447-455,
data/heads_score/*.json used at run_longbench.py:225-234).  This repo does
not copy them; this tool (re)creates the same layout from public sources:

    python tools/fetch_data.py --longbench            # HF THUDM/LongBench
    python tools/fetch_data.py --essays               # PG essays (needle)
    python tools/fetch_data.py --heads [--synthetic]  # HeadKV score file
    python tools/fetch_data.py --ruler                # synthetic RULER tasks
    python tools/fetch_data.py --all

Network-free generators (--heads --synthetic, --ruler) run anywhere;
downloads need egress.  Output layout matches the reference exactly so
scripts/longbench/eval.sh etc. run out of the box afterwards.
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "data")

LONGBENCH_DATASETS = [
    "narrativeqa", "qasper", "multifieldqa_en", "hotpotqa", "2wikimqa",
    "musique", "gov_report", "qmsum", "multi_news", "trec", "triviaqa",
    "samsum", "passage_count", "passage_retrieval_en", "lcc", "repobench-p",
]

# gkamradt/LLMTest_NeedleInAHaystack is the canonical public copy of the
# Paul Graham essay corpus the reference bundles (run_needle_in_haystack.py:1-4
# credits the same source).
ESSAYS_URL = ("https://raw.githubusercontent.com/gkamradt/"
              "LLMTest_NeedleInAHaystack/main/needlehaystack/PaulGrahamEssays")
ESSAY_NAMES = [
    "addiction", "aord", "apple", "avg", "before", "bias", "boss", "copy",
    "corpdev", "desres", "diff", "ecw", "founders", "foundervisa", "gap",
    "gba", "gh", "goodart", "goodtaste", "hubs", "hw", "iflisp", "island",
    "know", "langdes", "laundry", "love", "mod", "newideas", "nft",
    "philosophy", "popular", "pow", "rootsoflisp", "rss", "siebel",
    "startupideas", "submarine", "superlinear", "todo", "unions", "useful",
    "vb", "vcsqueeze", "vw", "want", "web20", "weird", "wisdom", "worked",
]


def fetch_longbench(datasets=None):
    """LongBench test splits from the public HF dataset (THUDM/LongBench),
    written as the reference's one-JSON-object-per-line layout."""
    try:
        from datasets import load_dataset
    except ImportError:
        sys.exit("pip install datasets (or use --ruler/--heads --synthetic "
                 "for the network-free fixtures)")
    out_dir = os.path.join(DATA, "LongBench")
    os.makedirs(out_dir, exist_ok=True)
    for name in datasets or LONGBENCH_DATASETS:
        path = os.path.join(out_dir, f"{name}.jsonl")
        if os.path.exists(path):
            print(f"skip {path} (exists)")
            continue
        ds = load_dataset("THUDM/LongBench", name, split="test")
        with open(path, "w") as f:
            for ex in ds:
                f.write(json.dumps(ex, ensure_ascii=False) + "\n")
        print(f"wrote {path} ({len(ds)} examples)")


def fetch_essays():
    import urllib.request
    out_dir = os.path.join(DATA, "PaulGrahamEssays")
    os.makedirs(out_dir, exist_ok=True)
    for name in ESSAY_NAMES:
        path = os.path.join(out_dir, f"{name}.txt")
        if os.path.exists(path):
            continue
        url = f"{ESSAYS_URL}/{name}.txt"
        try:
            urllib.request.urlretrieve(url, path)
            print(f"wrote {path}")
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"FAILED {url}: {e}")


def gen_heads(num_layers=32, num_heads=32, seed=0, model_name=None,
              synthetic=True):
    """HeadKV retrieval-reasoning head scores, reference schema: ONE json
    line, dict of "layer-head" -> list of floats (SURVEY.md §1 data assets;
    consumed by evals/longbench.py:headkv_capacities exactly like
    run_longbench.py:225-234).

    --synthetic draws a heavy-tailed score distribution (a few strong
    retrieval heads, most near zero — the shape reported by the HeadKV
    paper, arXiv:2410.19258) so HeadKV runs end-to-end without the paper's
    probing pipeline; real scores can be regenerated with that pipeline and
    dropped into the same path."""
    out_dir = os.path.join(DATA, "heads_score")
    os.makedirs(out_dir, exist_ok=True)
    model_name = model_name or "Meta-Llama-3-8B-Instruct"
    path = os.path.join(out_dir,
                        f"{model_name}_retrieval_reasoning_heads.json")
    rng = random.Random(seed)
    scores = {}
    for l in range(num_layers):
        for h in range(num_heads):
            # ~5% strong heads, lognormal-ish tail elsewhere.
            if rng.random() < 0.05:
                base = rng.uniform(0.5, 1.0)
            else:
                base = rng.random() ** 4 * 0.2
            scores[f"{l}-{h}"] = [round(base * rng.uniform(0.8, 1.2), 6)
                                  for _ in range(10)]
    with open(path, "w") as f:
        f.write(json.dumps(scores) + "\n")
    print(f"wrote {path} ({num_layers}x{num_heads} heads, synthetic)")
    return path


def gen_ruler(context_lengths=(4096,), n_examples=25, seed=0,
              vocab_words=None):
    """Synthetic RULER task files in the reference layout
    data/RULER/{length}/{task}.jsonl (records: index/input/outputs/length).

    RULER is a synthetic benchmark by construction (arXiv:2404.06654); the
    reference ships pre-generated jsonl.  This generator produces the
    niah (needle-in-a-haystack) task family + common words extraction —
    enough to exercise every code path of evals/ruler.py and score
    string_match_all comparably across methods.  For the full official 11
    tasks, use NVIDIA's generator and drop files into the same layout."""
    rng = random.Random(seed)
    words = vocab_words or [
        "apple", "river", "stone", "cloud", "ember", "frost", "grove",
        "haven", "iris", "jade", "karma", "lumen", "maple", "noble",
        "ocean", "pearl", "quartz", "raven", "sage", "tiger",
    ]

    def haystack(n_tokens):
        out = []
        while len(out) < n_tokens:
            out.append(rng.choice(words))
        return out

    def niah(length, n_keys, n_queries):
        recs = []
        for i in range(n_examples):
            toks = haystack(int(length * 0.6))  # ~tokens per word margin
            keys, vals = [], []
            for k in range(n_keys):
                key = f"{rng.choice(words)}-{rng.randrange(10000)}"
                val = str(rng.randrange(100000, 999999))
                keys.append(key)
                vals.append(val)
                pos = rng.randrange(len(toks))
                toks.insert(pos, f"One of the special magic numbers for "
                                 f"{key} is: {val}.")
            qi = rng.randrange(n_keys) if n_keys > 1 else 0
            prompt = (" ".join(toks)
                      + f"\nWhat is the special magic number for {keys[qi]} "
                        "mentioned in the provided text? The special magic "
                        f"number for {keys[qi]} mentioned in the provided "
                        "text is")
            recs.append({"index": i, "input": prompt,
                         "outputs": [vals[qi]], "length": length})
        return recs

    def cwe(length):
        recs = []
        for i in range(n_examples):
            common = rng.sample(words, 10)
            toks = []
            for w in common:
                toks += [w] * 30
            toks += haystack(max(0, int(length * 0.4) - len(toks)))
            rng.shuffle(toks)
            prompt = (" ".join(toks)
                      + "\nWhat are the 10 most common words in the above "
                        "list? Answer: The top 10 words that appear most "
                        "often in the list are:")
            recs.append({"index": i, "input": prompt, "outputs": common,
                         "length": length})
        return recs

    tasks = {
        "niah_single_1": lambda L: niah(L, 1, 1),
        "niah_single_2": lambda L: niah(L, 1, 1),
        "niah_multikey_1": lambda L: niah(L, 4, 1),
        "niah_multikey_2": lambda L: niah(L, 4, 1),
        "niah_multiquery": lambda L: niah(L, 4, 2),
        "niah_multivalue": lambda L: niah(L, 2, 1),
        "cwe": cwe,
    }
    for L in context_lengths:
        out_dir = os.path.join(DATA, "RULER", str(L))
        os.makedirs(out_dir, exist_ok=True)
        for task, gen in tasks.items():
            path = os.path.join(out_dir, f"{task}.jsonl")
            with open(path, "w") as f:
                for rec in gen(L):
                    f.write(json.dumps(rec) + "\n")
            print(f"wrote {path}")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--longbench", action="store_true")
    ap.add_argument("--essays", action="store_true")
    ap.add_argument("--heads", action="store_true")
    ap.add_argument("--ruler", action="store_true")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--synthetic", action="store_true",
                    help="heads: synthetic scores (no probing pipeline)")
    ap.add_argument("--num_layers", type=int, default=32)
    ap.add_argument("--num_heads", type=int, default=32)
    ap.add_argument("--model_name", type=str, default=None)
    ap.add_argument("--context_lengths", type=int, nargs="*",
                    default=[4096])
    args = ap.parse_args(argv)

    if args.all or args.longbench:
        fetch_longbench()
    if args.all or args.essays:
        fetch_essays()
    if args.all or args.heads:
        gen_heads(args.num_layers, args.num_heads,
                  model_name=args.model_name)
    if args.all or args.ruler:
        gen_ruler(tuple(args.context_lengths))
    if not any([args.all, args.longbench, args.essays, args.heads,
                args.ruler]):
        ap.print_help()


if __name__ == "__main__":
    main()
